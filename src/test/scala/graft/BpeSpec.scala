package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

/** BPE merge training: the column-expression fold against an
  * independent driver-side reference implementation, the classic
  * worked example end-to-end, and the greedy-scan edge cases
  * (overlapping pairs, re-merging across rounds).
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent mini-trainer over a word→count map (plain Scala). */
  private def referenceTrain(
      words: Map[String, Long],
      nMerges: Int,
      minCount: Long = 2): (Seq[(String, String)], Map[Seq[String], Long]) = {
    var vocab: Map[Seq[String], Long] =
      words.map { case (w, n) => (w.map(_.toString): Seq[String]) -> n }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _ =>
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }
        .headOption
      best match {
        case Some(((a, b), c)) if c >= minCount =>
          merges += ((a, b))
          vocab = vocab.map { case (syms, n) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toSeq: Seq[String]) -> n
          }
        case _ => continue = false
      }
    }
    (merges.toSeq, vocab)
  }

  test("applyMerge fold matches the reference greedy scan, incl. overlap") {
    val words = Seq("aaa", "aaaa", "abab", "banana", "aab", "ba")
    val df = words.toDF("w")
      .select(col("w"), Bpe.splitChars(col("w")).as("symbols"))
    val cases = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("n", "a"))
    cases.foreach { case (a, b) =>
      val got = df
        .select(col("w"), Bpe.applyMerge(col("symbols"), a, b).as("m"))
        .as[(String, Seq[String])]
        .collect()
        .toMap
      words.foreach { w =>
        assert(
          got(w) == Bpe.encodeWordReference(w, Seq((a, b))),
          s"word=$w merge=($a,$b)")
      }
    }
  }

  test("applyMerges chains rounds so merged symbols can re-merge") {
    // after (l,o) and (lo,w), "low" must become the single symbol "low"
    val merges = Seq(("l", "o"), ("lo", "w"))
    val got = Seq("lower").toDF("w")
      .select(Bpe.applyMerges(Bpe.splitChars(col("w")), merges).as("m"))
      .as[Seq[String]]
      .head()
    assert(got == Seq("low", "e", "r"))
    assert(got == Bpe.encodeWordReference("lower", merges))
  }

  test("trainMerges reproduces the reference trainer on the classic corpus") {
    // Sennrich et al. worked example: {low:5, lower:2, newest:6, widest:3}
    val rows = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = rows.toDF("text")
    val (merges, vocabDf) = Bpe.trainMerges(df, "text", nMerges = 8)
    val (expMerges, expVocab) = referenceTrain(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L),
      nMerges = 8)
    assert(merges == expMerges)
    val gotVocab = vocabDf
      .as[(Seq[String], Long)]
      .collect()
      .map { case (s, n) => (s: Seq[String]) -> n }
      .toMap
    assert(gotVocab == expVocab)
    // and the learned tokenizer encodes an UNSEEN word consistently
    // between the column fold and the reference scan
    val enc = Seq("lowest").toDF("w")
      .select(Bpe.applyMerges(Bpe.splitChars(col("w")), merges).as("m"))
      .as[Seq[String]]
      .head()
    assert(enc == Bpe.encodeWordReference("lowest", merges))
  }

  test("applyMerge on an empty symbol array is the empty array, not an error") {
    val got = Seq(Seq.empty[String]).toDF("symbols")
      .select(Bpe.applyMerge(col("symbols"), "a", "b").as("m"))
      .as[Seq[String]]
      .head()
    assert(got == Seq.empty[String])
  }

  test("trainMerges stops early when no pair reaches minCount") {
    val df = Seq("ab", "cd", "ef").toDF("text") // every pair count = 1
    val (merges, _) = Bpe.trainMerges(df, "text", nMerges = 5, minCount = 2)
    assert(merges.isEmpty)
  }

  test("encodeWords equals the fold form and the reference, per distinct word") {
    // deep merge list (the regime encodeWords exists for) over words
    // with overlap and re-merge cases
    // the non-BMP word pins code-POINT splitting: the reference scan
    // must see the emoji as ONE symbol, as splitChars (Spark substr,
    // code-point indexed) does — UTF-16 .map(_.toString) would shatter
    // it into two lone surrogates and diverge from the fold form
    val words =
      Seq("banana", "bandana", "ananas", "nab", "b", "", "banana",
        "🙂ab").toDF("w")
    val merges = Seq(
      ("a", "n"), ("an", "a"), ("b", "ana"), ("bana", "n"), ("n", "a"),
      ("d", "an"), ("banan", "a"), ("na", "b"))
    val got = Bpe.encodeWords(words, "w", merges)
      .as[(String, Seq[String])].collect().toMap
    assert(got.size === 7) // distinct words, duplicate collapsed
    got.foreach { case (w, syms) =>
      assert(syms === Bpe.encodeWordReference(w, merges), s"word '$w'")
      // fold form agrees wherever it is cheap enough to build
      val fold = words.where(col("w") === w).limit(1)
        .select(Bpe.applyMerges(Bpe.splitChars(col("w")), merges).as("s"))
        .as[Seq[String]].head()
      assert(fold === syms, s"fold diverges on '$w'")
    }
    assert(got("") === Seq.empty[String]) // empty word -> empty symbols
  }

  test("pairCounts weights pairs by word frequency") {
    val df = (Seq.fill(3)("ab") ++ Seq.fill(2)("abc")).toDF("text")
    val got = Bpe.pairCounts(Bpe.vocab(df, "text"))
      .as[(String, String, Long)]
      .collect()
      .map { case (a, b, c) => (a, b) -> c }
      .toMap
    assert(got == Map(("a", "b") -> 5L, ("b", "c") -> 2L))
  }
}
