package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the WordNgramsExpr kernel element-for-element against the
  * transform/slice/concat_ws composition it replaced — including the
  * whitespace edge cases where SQL trim (spaces only) and Java
  * Pattern.split(-1) (leading/trailing empty tokens) have sharp corners.
  * A drifted gram string would silently change every dedup bucket. */
class TextVectorExpressionsSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("text-vector-expr-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The replaced composition, inlined as the executable spec. */
  private def wordNgramsOld(text: Column, n: Int): Column = {
    val words = split(trim(text), "\\s+")
    if (n == 1) words
    else when(size(words) >= n,
        transform(sequence(lit(1), size(words) - (n - 1)),
          i => concat_ws(" ", slice(words, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  private val edgeDocs = Seq(
    "the quick brown fox jumps",
    "one",
    "",
    "   ",                       // all spaces → trim → "" → [""]
    "a\n",                       // trailing \n survives SQL trim → ["a", ""]
    "\t x",                      // leading \t → leading empty token
    "  padded  with   runs  ",
    "a b  c\td\ne f",
    "exact exact exact exact",
    "ünïcode tökens здесь 中文 字")

  test("WordNgramsExpr equals the old composition for n in 1..4 on edge docs") {
    val sp = spark; import sp.implicits._
    val df = edgeDocs.toDF("t")
    (1 to 4).foreach { n =>
      val rows = df.select(
        graft.functions.TextFunctions.wordNgrams(col("t"), n).as("k"),
        wordNgramsOld(col("t"), n).as("o")).collect()
      rows.zip(edgeDocs).foreach { case (r, doc) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n doc=${doc.replace("\n", "\\n").replace("\t", "\\t")}")
      }
    }
  }

  test("kernel grams drive identical minhash shingle sets") {
    val sp = spark; import sp.implicits._
    val df = edgeDocs.filter(_.trim.nonEmpty).toDF("t")
    val rows = df.select(
      array_sort(graft.operators.Dedup.shingles(col("t"), 2)).as("k"),
      array_sort(array_distinct(wordNgramsOld(col("t"), 2))).as("o")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }
}
