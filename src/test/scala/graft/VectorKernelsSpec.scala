package graft

import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions._
import graft.functions.TextFunctions

/** The codegen'd vector/dedup kernels must be bit-identical to the
  * higher-order-function Column forms they replaced (the round-1
  * oracle-verified formulations). Randomized with a fixed seed. */
class VectorKernelsSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(42)

  test("qdotN == aggregate(zip_with(*)) on random long vectors") {
    val vecs = Seq.fill(16)(Seq.fill(24)(rng.nextLong() % 100000L))
    val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
    val r = df.crossJoin(df.select($"v".as("w")))
      .select(
        qdotN($"v", $"w").as("native"),
        aggregate(zip_with($"v", $"w", _ * _), lit(0L), _ + _).as("hof"))
      .as[(Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (n, h) => assert(n == h) }
  }

  test("ddotN == aggregate(zip_with(*)) on random double vectors") {
    val vecs = Seq.fill(16)(Seq.fill(24)(rng.nextDouble() * 20 - 10))
    val df = vecs.toDF("v")
    val r = df.crossJoin(df.select($"v".as("w")))
      .select(
        ddotN($"v", $"w").as("native"),
        aggregate(zip_with($"v", $"w", _ * _), lit(0.0), _ + _).as("hof"))
      .as[(Double, Double)].collect()
    // same sequential fold order → bit-identical
    r.foreach { case (n, h) => assert(n == h) }
  }

  test("quantizeN == transform(round(x*1000)) incl. negative halves") {
    val edge = Seq(0.0f, 1.0f, -1.0f, 0.0005f, -0.0005f, 0.1234567f,
      -0.9999995f, 123.456f, -123.456f, 1e-8f, -1e-8f, 0.4999999f,
      2.5e-3f, -2.5e-3f, 1.5e-3f, -1.5e-3f)
    val rand = Seq.fill(256)(rng.nextFloat() * 20 - 10)
    val df = Seq(edge ++ rand).toDF("v")
    val r = df.select(
      quantizeN($"v", 1000).as("native"),
      transform($"v", x => round(x.cast("double") * 1000).cast("long"))
        .as("hof"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(r._1 == r._2)
  }

  test("minhashSigsN == array_min(transform(md5)) per salt") {
    val words = Seq("the", "quick", "brown", "fox", "data", "λ", "été",
      "x1", "q9")
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f g h i j k l m n o p",
      "same same same same same",
      "one two", // < 3 tokens -> no shingles
      "  spaced   out   tokens  here ") ++
      Seq.fill(20)(Seq.fill(rng.nextInt(30) + 1)(
        words(rng.nextInt(words.size))).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
    val toks = TextFunctions.normToks($"text")
    val sh = TextFunctions.shingles(toks, 3)
    val r = df.select(
      minhashSigsN(toks, 3, 4).as("native"),
      array(
        (0 until 4).map(i =>
          array_min(transform(sh, s => md5(concat(lit(s"s$i|"), s))))): _*
      ).as("hof"),
      size(sh).as("nsh"))
      .as[(Seq[String], Seq[String], Int)].collect()
    r.foreach { case (native, hof, nsh) =>
      if (nsh == 0) assert(native.isEmpty)
      else assert(native == hof)
    }
  }

  test("sortedTokenFpN == md5(concat_ws(sorted distinct tokens))") {
    val vocab = Seq("aa", "bb", "cc", "zz", "m", "q", "42", "été", "ZZ")
    val texts = Seq.fill(30)(Seq.fill(rng.nextInt(25) + 1)(
      vocab(rng.nextInt(vocab.size))).mkString(" ")) :+ "solo"
    val df = texts.toDF("text")
    val toks = TextFunctions.normToks($"text")
    val r = df.select(
      sortedTokenFpN(toks).as("n"),
      md5(concat_ws(" ", array_sort(array_distinct(toks)))).as("h"))
      .as[(String, String)].collect()
    r.foreach { case (n, h) => assert(n == h) }
  }

  test("wordCountsN == per-word filter counts") {
    val words = Seq("the", "query", "spark", "shuffle")
    val texts = Seq("the query the spark", "shuffle shuffle shuffle",
      "nothing matches here", "")
    val df = texts.toDF("text")
    val toks = TextFunctions.normToks($"text")
    val r = df.select(
      wordCountsN(toks, words).as("native"),
      array(words.map(w =>
        size(filter(toks, x => x === lit(w)))): _*).as("hof"))
      .as[(Seq[Int], Seq[Int])].collect()
    r.foreach { case (n, h) => assert(n == h) }
  }

  test("shinglesN == HOF shingles, with and without distinct") {
    val rng = new scala.util.Random(5)
    val vocab = Seq("aa", "b", "ccc", "dd", "aa")
    val texts = ((1 to 20).map(_ => Seq.fill(rng.nextInt(8) + 1)(
      vocab(rng.nextInt(vocab.size))).mkString(" ")) :+ "solo").toDF("text")
    val toks = TextFunctions.normToks($"text")
    val r = texts.select(
      shinglesN(toks, 3).as("n"),
      TextFunctions.shingles(toks, 3).as("h"),
      shinglesN(toks, 3, distinct = true).as("nd"),
      array_distinct(TextFunctions.shingles(toks, 3)).as("hd"))
      .as[(Seq[String], Seq[String], Seq[String], Seq[String])].collect()
    r.foreach { case (n, h, nd, hd) => assert(n == h && nd == hd) }
  }

  test("srpKeysN: tables use independent hyperplanes beyond 16 bits") {
    // with the old 16-stride seed, table t+1's bit 0 reused table t's
    // bit 16 hyperplane, so for bits > 16 the keys satisfied
    // bit16(k0) == bit0(k1) on EVERY row; the 64-stride must break that
    val vecs = Seq.fill(64)(Seq.fill(24)(rng.nextLong() % 1000L))
    val keys = vecs.toDF("q")
      .select(srpKeysN($"q", 2, 20)).as[Seq[Long]].collect()
    assert(keys.forall(_.length == 2))
    val coupled = keys.count(k => ((k(0) >> 16) & 1L) == (k(1) & 1L))
    assert(coupled < keys.length, "tables still share hyperplanes")
  }

  test("wordCountsN counts a duplicated word into every slot") {
    // "the" listed twice (as if shared by two marker families): both
    // slots must get its count, not just the last one registered
    val words = Seq("the", "spark", "the")
    val r = Seq("the the spark").toDF("text")
      .select(wordCountsN(TextFunctions.normToks($"text"), words))
      .as[Seq[Int]].collect()
    assert(r.head == Seq(2, 1, 2))
  }
}
