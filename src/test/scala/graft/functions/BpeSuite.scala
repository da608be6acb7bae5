package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Loadable GPT-2-format BPE: parity against an independent naive
  * reference implementation (a direct transliteration of the published
  * algorithm — openai/gpt-2 encoder.py — with none of the production
  * path's caching/merge-in-place optimizations) on real corpus text,
  * plus hand-verified cases, the byte table, and the Spark expressions
  * (codegen + null paths). */
class BpeSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var work: java.io.File = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    work = java.nio.file.Files.createTempDirectory("graft_bpe").toFile
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def write(name: String, content: String): String = {
    val f = new java.io.File(work, name)
    java.nio.file.Files.write(f.toPath,
      content.getBytes(StandardCharsets.UTF_8))
    f.getAbsolutePath
  }

  // ---- independent NAIVE reference: recompute everything, no caches,
  // immutable lists, pair set via sliding window — the published
  // algorithm shape, deliberately different code from Bpe.State
  private def naiveBpe(text: String,
                       merges: Seq[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    def word(sym: List[String]): List[String] = {
      if (sym.size < 2) return sym
      val pairs = sym.zip(sym.tail)
      val ranked = pairs.filter(p => rank.contains(p))
      if (ranked.isEmpty) return sym
      val best = ranked.minBy(rank)
      def mergeAll(s: List[String]): List[String] = s match {
        case a :: b :: rest if (a, b) == best => (a + b) :: mergeAll(rest)
        case a :: rest => a :: mergeAll(rest)
        case Nil => Nil
      }
      word(mergeAll(sym))
    }
    val m = Bpe.Pretoken.matcher(text)
    val out = scala.collection.mutable.ListBuffer[String]()
    while (m.find()) {
      val enc = m.group().getBytes(StandardCharsets.UTF_8)
        .map(b => Bpe.byteToChar(b & 0xff).toString).toList
      out ++= word(enc)
    }
    out.toList
  }

  private val cascading = Seq(
    ("t", "h"), ("th", "e"), ("e", "r"), ("er", "s"), ("i", "n"),
    ("Ġ", "th"), ("Ġth", "e"))
  private def cascadingFile(): String = write("cascading_merges.txt",
    "#version: 0.2\n" + cascading.map { case (a, b) => s"$a $b" }
      .mkString("", "\n", "\n"))

  test("byte table matches GPT-2 bytes_to_unicode") {
    assert(Bpe.byteToChar('a'.toInt) == 'a')
    assert(Bpe.byteToChar('~'.toInt) == '~')
    assert(Bpe.byteToChar(' '.toInt) == 'Ġ') // Ġ
    assert(Bpe.byteToChar('\n'.toInt) == 'Ċ') // Ċ
    assert(Bpe.byteToChar(0) == 'Ā')
    assert(Bpe.byteToChar(0xAD) == 'Ń') // soft hyphen (the gap at 173)
    assert(Bpe.byteToChar.distinct.length == 256) // reversible
  }

  test("hand-verified cascading merges") {
    val st = Bpe.stateFor(cascadingFile(), "")
    // "the" -> t,h,e -> th,e -> the (1)
    assert(st.count("the") == 1)
    // " the" -> Ġ,t,h,e -> Ġ,th,e ("t h" rank 0) -> Ġ,the ("th e" rank 1
    // beats "Ġ th" rank 5; once `the` forms, (Ġ,the) is unranked —
    // "Ġth e" rank 6 needed Ġth to have formed first) -> 2 symbols
    assert(st.count(" the") == 2)
    // "thers" -> th,e,r,s -> the,r,s -> no "e r" left; no (the,r),(r,s)
    assert(st.count("thers") == 3)
    // "ers" -> e,r,s -> er,s -> ers
    assert(st.count("ers") == 1)
    // pre-token split: "in 2024!" -> [in][Ġ2024... wait digits split:
    // "in", " 2024", "!" -> in=1, Ġ,2,0,2,4=5, !=1
    assert(st.count("in 2024!") == 7)
    // contraction split: "it's" -> "it" (i,t: no merge -> 2) + "'s" (2)
    assert(st.count("it's") == 4)
    // empty input
    assert(st.count("") == 0)
  }

  test("whitespace-only pre-token counts its bytes when unmerged") {
    val st = Bpe.stateFor(cascadingFile(), "")
    // no space merges in this model: "   " = Ġ,Ġ,Ġ = 3 symbols
    assert(st.count("   ") == 3)
  }

  test("naive-reference parity on real corpus text (cascading model)") {
    val mergesPath = cascadingFile()
    val st = Bpe.stateFor(mergesPath, "")
    val texts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").limit(200).collect().map(_.getString(0))
    assert(texts.nonEmpty)
    texts.foreach { t =>
      assert(st.count(t) == naiveBpe(t, cascading).length.toLong,
        s"count mismatch on: ${t.take(80)}")
    }
  }

  test("production-scale model (50k merges): naive parity + " +
    "count==len(encode) on a 1k-doc corpus sample (r19, VERDICT r18 #3)") {
    // The gate fixture has 5 merges; GPT-2 ships ~50k. At that scale the
    // rank table's size and the cascade depth are what the 200-doc
    // cascading test cannot see. The synthetic model is deterministic
    // and chains like a trained one (see Bpe.syntheticModel).
    val (mergesTxt, vocabTxt) = Bpe.syntheticModel(50000)
    assert(mergesTxt.linesIterator.count(l =>
      l.nonEmpty && !l.startsWith("#")) == 50000)
    val mp = write("synth50k_merges.txt", mergesTxt)
    val vp = write("synth50k_vocab.json", vocabTxt)
    val st = Bpe.stateFor(mp, vp)
    val mergePairs = mergesTxt.linesIterator.filter(l =>
      l.nonEmpty && !l.startsWith("#")).map { l =>
      val sp = l.lastIndexOf(' '); (l.substring(0, sp), l.substring(sp + 1))
    }.toSeq
    val texts = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select("text").limit(1000).collect().map(_.getString(0))
    assert(texts.length == 1000)
    var toks = 0L
    texts.foreach { t =>
      val ids = st.encode(t)
      val n = st.count(t)
      assert(n == ids.length.toLong, s"count!=encode on: ${t.take(80)}")
      toks += n
    }
    // the model must actually ENGAGE on English text (merges fire, the
    // cascade runs) — unmerged bytes would be ~5x the whitespace count
    val bytes = texts.map(_.getBytes(StandardCharsets.UTF_8).length.toLong).sum
    assert(toks < bytes / 2, s"model barely merged: $toks tokens / $bytes bytes")
    // naive parity on a 100-doc subsample (the naive reference is
    // deliberately unoptimized; 1k docs x 50k-rank minBy is minutes)
    texts.take(100).foreach { t =>
      assert(st.count(t) == naiveBpe(t, mergePairs).length.toLong,
        s"50k-model parity mismatch on: ${t.take(80)}")
    }
  }

  test("merge-loop worst case: a 10k-char unbroken word stays bounded " +
    "and matches naive (r19)") {
    val (mergesTxt, vocabTxt) = Bpe.syntheticModel(50000)
    val st = Bpe.stateFor(write("synth50k_m2.txt", mergesTxt),
      write("synth50k_v2.json", vocabTxt))
    // one pre-token of 10,010 chars: the O(len) pair scan re-runs after
    // every merge round, the O(len^2) shape the Scaladoc warns about
    val word = "abcdefghijklmnopqrstuvwxyz" * 385
    val t0 = System.nanoTime()
    val n = st.count(word)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(n > 0 && n < word.length)
    assert(n == st.encode(word).length.toLong)
    // generous CI bound — the measured figure is ledgered by the bpe
    // soak; this guards against an accidental O(len^3) regression
    assert(sec < 60.0, f"10k-char word took $sec%.1f s")
    // cache hit: second call must be near-instant and identical
    val t1 = System.nanoTime()
    assert(st.count(word) == n)
    assert((System.nanoTime() - t1) / 1e9 < 0.1)
  }

  test("naive-reference parity on adversarial strings (fixture model)") {
    val st = Bpe.stateFor(Bpe.fixtureMergesPath(), "")
    val merges = Seq(("e", "r"), ("t", "h"), ("a", "n"), ("i", "s"),
      ("o", "u"))
    val cases = Seq("erer", "rer", "eer", "ere", "this is thou", "ttthhh",
      "héllo wörld", "naïve — em-dash", "tab\tnewline\nmix", "a", "",
      "THE SHOUTING", "under42over", "l'été", "日本語テキスト",
      "mixed 日本 and ascii", "'s's's", "  double  spaces  ",
      "trailing space ", " leading", "punct!!!???...", "🙂 emoji")
    cases.foreach { t =>
      assert(st.count(t) == naiveBpe(t, merges).length.toLong,
        s"count mismatch on: $t")
    }
  }

  test("fixture oracle rule: count = bytes - pair occurrences") {
    // the p42 gate's SQL replay rule, pinned here against the engine
    val st = Bpe.stateFor(Bpe.fixtureMergesPath(), "")
    val pairs = Seq("er", "th", "an", "is", "ou")
    def occ(t: String, p: String): Int =
      (t.length - t.replace(p, "").length) / 2
    Seq("the error is an ours", "this mouse is rather thin",
      "key agg row scan slow fast table value part hash").foreach { t =>
      val want = t.getBytes(StandardCharsets.UTF_8).length -
        pairs.map(occ(t, _)).sum
      assert(st.count(t) == want.toLong, s"oracle rule broke on: $t")
    }
  }

  test("encode: ids from planted vocab; inconsistent vocab fails loudly") {
    val mergesPath = cascadingFile()
    // vocab covering every single byte-char + the cascading merges
    val singles = (0 until 256).map(b =>
      "\"" + (Bpe.byteToChar(b) match {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }) + "\": " + b)
    val mergedSyms = Seq("th", "the", "er", "ers", "in", "Ġth", "Ġthe")
    val withMerges = singles ++ mergedSyms.zipWithIndex.map {
      case (s, i) => "\"" + s + "\": " + (256 + i) }
    val vocabPath = write("cascading_vocab.json",
      withMerges.mkString("{", ", ", "}"))
    val st = Bpe.stateFor(mergesPath, vocabPath)
    assert(st.encode("the").toSeq == Seq(257)) // "the"
    // " the" -> [Ġ, the] (see the count test), " in" -> [Ġ, in];
    // singles carry byte ids (Ġ = space = 32), merges 256+index
    assert(st.encode(" the in").toSeq == Seq(32, 257, 32, 260))
    // a vocab that misses a merged symbol must fail loudly, naming it
    val thinVocab = write("thin_vocab.json", "{\"t\": 1, \"h\": 2}")
    val st2 = Bpe.stateFor(mergesPath, thinVocab)
    val e = intercept[IllegalArgumentException] { st2.encode("the") }
    assert(e.getMessage.contains("the"), e.getMessage)
  }

  test("bpeTokenCount / bpeEncode Spark expressions (codegen + null)") {
    val s = spark
    import s.implicits._
    val merges = Bpe.fixtureMergesPath()
    val df = Seq(Some("this is rather fun"), Some(""), None)
      .toDF("text")
    val got = df.select(
      TextFunctions.bpeTokenCount(col("text"), merges).as("n")).collect()
    // "this"=[th,is]=2, " is"=[Ġ,is]=2, " rather"=[Ġ,r,a,th,er]=5,
    // " fun"=[Ġ,f,u,n]=4 -> 13
    assert(got(0).getLong(0) == 13L)
    assert(got(1).getLong(0) == 0L)
    assert(got(2).isNullAt(0))
    // encode round-trip with the fixture vocab (ids: bytes for singles,
    // 256+rank for the five merges)
    val vocab = Bpe.fixtureVocabPath()
    val ids = df.limit(1).select(
      TextFunctions.bpeEncode(col("text"), merges, vocab).as("ids"))
      .collect().head.getSeq[Int](0)
    // th=257, is=259, Ġ=288('Ġ'? byte id of space=32) ...
    assert(ids.take(2) == Seq(257, 259), s"got $ids")
    assert(ids.length == 13)
    // whole-stage codegen actually engaged (no fallback) — over a
    // non-foldable input (a literal Seq df collapses to LocalTableScan)
    val planDf = spark.range(4).select(
      concat(lit("this is rather "), col("id").cast("string")).as("text"))
    val planned = planDf.select(
      TextFunctions.bpeTokenCount(col("text"), merges).as("n"))
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan) // *(n) = codegen'd span
    assert(planned.agg(sum("n")).collect().head.getLong(0) > 0)
  }

  test("fixture vocab ids are byte values for singles") {
    val st = Bpe.stateFor(Bpe.fixtureMergesPath(), Bpe.fixtureVocabPath())
    assert(st.encode("e").toSeq == Seq('e'.toInt))
    assert(st.encode(" ").toSeq == Seq(' '.toInt)) // Ġ carries id 32
    assert(st.encode("er").toSeq == Seq(256))
    assert(st.encode("ouis").toSeq == Seq(260, 259))
  }
}
