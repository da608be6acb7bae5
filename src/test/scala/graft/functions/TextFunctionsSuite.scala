package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Direct verification of the PII patterns and repetition-quality stats —
  * the specific behaviors the p22/p23 oracles exercise in bulk, pinned
  * here as named cases (NANP phone forms, adversarial digit runs, the
  * Gopher-style fraction values on planted docs, short-doc guards). */
class TextFunctionsSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("text-functions-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def one[T](text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): T = {
    val sp = spark; import sp.implicits._
    Seq(text).toDF("t").select(c(col("t")).as("v")).collect().head.getAs[T]("v")
  }

  // ---- PII ---------------------------------------------------------------

  test("PhoneRegex matches every documented NANP form") {
    val forms = Seq(
      "555-123-4567", "(555) 123-4567", "(555)123-4567", "555.123.4567",
      "555 123 4567", "+1 555.123.4567", "1-800-555-0199", "555-1234567",
      "(555)1234567")
    forms.foreach { f =>
      assert(one[Int](s"call $f now", TextFunctions.piiPhoneCount) == 1,
        s"should match: $f")
    }
  }

  test("PhoneRegex leaves bare digit runs and over-long numbers alone") {
    val nonPhones = Seq(
      "order 5551234567", "ref 15551234567", "ts 555-123-45678",
      "id 123456789012345", "v1.2.333 4567")
    nonPhones.foreach { t =>
      assert(one[Int](t, TextFunctions.piiPhoneCount) == 0,
        s"should NOT match: $t")
    }
  }

  test("redactPii replaces emails, IPs, phones; counts see each family") {
    val text = "mail a.b+c@ex-ample.org from 10.0.0.1 or call (555) 123-4567"
    assert(one[Int](text, TextFunctions.piiEmailCount) == 1)
    assert(one[Int](text, TextFunctions.piiIpCount) == 1)
    assert(one[Int](text, TextFunctions.piiPhoneCount) == 1)
    assert(one[String](text, TextFunctions.redactPii) ==
      "mail [EMAIL] from [IP] or call [PHONE]")
  }

  // ---- repetition stats (judge spot-check values, pinned) ----------------

  test("duplicate/top bigram fractions on 6x-repeated spam") {
    // "spam mail" x6 → 11 bigrams: "spam mail" x6 + "mail spam" x5;
    // dup = 1 - 2/11; top = 6/11
    val t = Seq.fill(6)("spam mail").mkString(" ")
    assert(math.abs(one[Double](t, TextFunctions.duplicateNgramFraction(_, 2))
      - (1.0 - 2.0 / 11)) < 1e-9)
    assert(math.abs(one[Double](t, TextFunctions.topNgramFraction(_, 2))
      - 6.0 / 11) < 1e-9)
  }

  test("bigram fractions on an alternating doc") {
    // "a b a b a b a b" → 7 bigrams: "a b" x4, "b a" x3 → dup 5/7, top 4/7
    val t = "a b a b a b a b"
    assert(math.abs(one[Double](t, TextFunctions.duplicateNgramFraction(_, 2))
      - 5.0 / 7) < 1e-9)
    assert(math.abs(one[Double](t, TextFunctions.topNgramFraction(_, 2))
      - 4.0 / 7) < 1e-9)
  }

  test("duplicateLineFraction counts repeated trimmed lines, skips blanks") {
    val t = "alpha\nbeta \n\n alpha\ngamma"
    // non-empty trimmed lines: alpha, beta, alpha, gamma → 1 - 3/4
    assert(math.abs(one[Double](t, TextFunctions.duplicateLineFraction(_))
      - 0.25) < 1e-9)
  }

  test("short docs yield 0.0 fractions (wordNgrams empty-array guard)") {
    assert(one[Double]("word", TextFunctions.duplicateNgramFraction(_, 2)) == 0.0)
    assert(one[Double]("word", TextFunctions.topNgramFraction(_, 2)) == 0.0)
    val sp = spark; import sp.implicits._
    val grams = Seq("one two").toDF("t")
      .select(TextFunctions.wordNgrams(col("t"), 3).as("g"))
      .collect().head.getSeq[String](0)
    assert(grams.isEmpty)
  }

  test("topNgramFraction run-length pass equals brute-force max multiplicity") {
    val docs = Seq(
      "x y z x y z x y q", "one two three", "a a a a a a",
      "p q p r p q p s p q")
    docs.foreach { d =>
      val grams = d.split("\\s+").sliding(2).map(_.mkString(" ")).toSeq
      val expected = grams.groupBy(identity).values.map(_.size).max.toDouble /
        grams.size
      assert(math.abs(one[Double](d, TextFunctions.topNgramFraction(_, 2))
        - expected) < 1e-9, s"doc: $d")
    }
  }
}
