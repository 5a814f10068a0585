package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UnigramLm

/** Unigram-LM tokenizer differentials: the distributed trainer (seeded
  * top-k + hard-EM over the word-frequency table) against a sequential
  * driver replay of the same algorithm, plus the structural contracts
  * (coverage, lossless encode, determinism, multi-char piece
  * emergence).
  */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent sequential replay of UnigramLm.train: plain Scala
    * maps, same seeding/tie/EM/prune rules, no Spark.
    */
  private def refTrain(
      texts: Seq[String],
      vocabSize: Int,
      seedSize: Int,
      maxPieceLen: Int,
      emIters: Int): Map[String, Double] = {
    val words = texts
      .flatMap(_.trim.toLowerCase.split("\\s+"))
      .filter(_.nonEmpty)
      .groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    def cps(w: String): IndexedSeq[String] = {
      val it = w.codePoints().iterator()
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) b += new String(Character.toChars(it.next()))
      b.toIndexedSeq
    }
    // seeding
    val cand = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, n) =>
      val c = cps(w)
      for {
        i <- c.indices
        l <- 1 to math.min(maxPieceLen, c.length - i)
      } cand.updateWith(c.slice(i, i + l).mkString) {
        case Some(x) => Some(x + n); case None => Some(n)
      }
    }
    val seeds = cand.toSeq.sortBy { case (p, c) => (-c, p) }.take(seedSize)
    val chars = cand.filter { case (p, _) => cps(p).length == 1 }
    var counts: Map[String, Long] = (seeds ++ chars).toMap
    def toLogp(cs: Map[String, Long]): Map[String, Double] = {
      val tot = cs.values.sum.toDouble
      cs.map { case (p, c) => p -> math.log(c / tot) }
    }
    var logp = toLogp(counts)
    def viterbi(w: String, lp: Map[String, Double]): Seq[String] = {
      val unk = if (lp.isEmpty) -1e9 else lp.values.min - 10.0
      val c = cps(w)
      val n = c.length
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val back = Array.fill(n + 1)(-1)
      best(0) = 0.0
      for (end <- 1 to n; start <- math.max(0, end - maxPieceLen) until end
           if best(start) != Double.NegativeInfinity) {
        val piece = c.slice(start, end).mkString
        val s = lp.get(piece) match {
          case Some(x) => x
          case None => if (end - start == 1) unk else Double.NegativeInfinity
        }
        if (s != Double.NegativeInfinity && best(start) + s > best(end)) {
          best(end) = best(start) + s; back(end) = start
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = n
      while (pos > 0) { out += c.slice(back(pos), pos).mkString; pos = back(pos) }
      out.reverse.toSeq
    }
    def em(lp: Map[String, Double], keep: Option[Set[String]])
        : Map[String, Double] = {
      val cnt = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (w, n) =>
        viterbi(w, lp).foreach(p =>
          cnt.updateWith(p) {
            case Some(x) => Some(x + n); case None => Some(n)
          })
      }
      val kept = keep match {
        case Some(k) => cnt.toMap.filter { case (p, _) => k(p) }
        case None => cnt.toMap
      }
      val withChars = lp.keysIterator
        .filter(p => cps(p).length == 1)
        .map(c0 => c0 -> math.max(kept.getOrElse(c0, 0L), 1L))
        .toMap
      toLogp(kept.filter { case (p, c0) =>
        c0 > 0 && !withChars.contains(p)
      } ++ withChars)
    }
    (1 to emIters).foreach(_ => logp = em(logp, None))
    val charSet = logp.keySet.filter(p => cps(p).length == 1)
    val ranked = logp.toSeq.sortBy { case (p, l) => (-l, p) }.map(_._1)
    val keep = scala.collection.mutable.LinkedHashSet.empty[String]
    keep ++= charSet
    ranked.iterator
      .filter(p => !keep.contains(p))
      .take(math.max(0, vocabSize - keep.size))
      .foreach(keep += _)
    em(logp, Some(keep.toSet))
  }

  private val corpus = Seq(
    "the running runner was running fast",
    "a runner keeps running and running along",
    "the fast runner ran past the running track",
    "running fast past the track was fun",
    "the the the runner ran and ran")

  test("distributed trainer equals the sequential replay piece-for-piece") {
    val df = corpus.zipWithIndex.map(_.swap).toDF("id", "text")
    val got =
      UnigramLm.train(df, "text", vocabSize = 40, seedSize = 80, emIters = 2)
    val want = refTrain(corpus, vocabSize = 40, seedSize = 80,
      maxPieceLen = 6, emIters = 2)
    assert(got.logp.keySet === want.keySet)
    got.logp.foreach { case (p, lp) =>
      assert(math.abs(lp - want(p)) < 1e-12, s"piece '$p'")
    }
    // determinism: a second training run is bit-identical
    val again =
      UnigramLm.train(df, "text", vocabSize = 40, seedSize = 80, emIters = 2)
    assert(again.logp === got.logp)
  }

  test("frequent substrings become multi-char pieces and encoding uses them") {
    val df = corpus.zipWithIndex.map(_.swap).toDF("id", "text")
    val model =
      UnigramLm.train(df, "text", vocabSize = 40, seedSize = 80, emIters = 2)
    // 'running' appears 6 times — the model must carve it (or a
    // superstring-bounded prefix) as a multi-char piece
    assert(model.logp.keys.exists(p => p.length > 1 && "running".contains(p)))
    val enc = UnigramLm.viterbi("running", model)
    assert(enc.mkString === "running")
    assert(enc.length < "running".length, "expected multi-char pieces")
  }

  test("encode is lossless for every training word and for unseen chars") {
    val df = corpus.zipWithIndex.map(_.swap).toDF("id", "text")
    val model =
      UnigramLm.train(df, "text", vocabSize = 40, seedSize = 80, emIters = 2)
    val words = corpus
      .flatMap(_.toLowerCase.split("\\s+")).distinct
    words.foreach { w =>
      assert(UnigramLm.viterbi(w, model).mkString === w, s"word '$w'")
    }
    // unseen characters fall back to unk single-char pieces, lossless
    assert(UnigramLm.viterbi("zzz9!", model).mkString === "zzz9!")
    assert(UnigramLm.viterbi("", model) === Seq.empty)
    // encodeWords (the corpus-join face) agrees with direct viterbi
    val encoded = UnigramLm
      .encodeWords(words.toDF("w"), "w", model)
      .as[(String, Seq[String])]
      .collect()
      .toMap
    words.foreach { w =>
      assert(encoded(w) === UnigramLm.viterbi(w, model), s"word '$w'")
    }
  }
}
