package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.textanalysis.Bpe

/** Distributed BPE trainer vs the hand-derived classic example, greedy
  * encoding, and the no-shuffle column encoder. */
class BpeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // the textbook corpus: low x5, lower x2, newest x6, widest x3
  private lazy val corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
    .mkString(" ")

  test("train reproduces the hand-derived merge sequence (count desc, lex tiebreak)") {
    val model = Bpe.train(Seq(corpus).toDF("text"), "text", nMerges = 5)
    // hand-derived: (e,s)=9 ties (s,t</w>)=9 -> lex; then cascades
    assert(model.merges == Seq(
      ("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w"), ("ew", "est</w>")))
  }

  test("greedy encode applies merges in rank order; unseen word falls back to chars") {
    val model = Bpe.train(Seq(corpus).toDF("text"), "text", nMerges = 5)
    // 'lowest' was never a training word, but its pieces were
    assert(Bpe.encodeWord("lowest", model) == Vector("lo", "w", "est</w>"))
    assert(Bpe.encodeWord("newest", model) == Vector("n", "ewest</w>")) // merge 5 applied
    // nothing mergeable -> raw chars + end sentinel
    assert(Bpe.encodeWord("zq", model) == Vector("z", "q</w>"))
    assert(Bpe.encode("Low  LOWEST", model) ==
      Seq("lo", "w</w>", "lo", "w", "est</w>")) // case-folded, multi-space
  }

  test("encodeCol matches driver-side encode row by row; deterministic across runs") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select($"doc_id", $"text")
    val model = Bpe.train(docs, "text", nMerges = 30, maxVocab = 1000)
    assert(model.merges.size == 30)
    val enc = Bpe.encodeCol(docs, "text", model)
      .select($"doc_id", $"tokens", $"n_tokens")
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[String]](1), r.getInt(2))).toList
    val byId = docs.as[(Long, String)].collect().toMap
    enc.take(20).foreach { case (id, toks, n) =>
      assert(toks.toSeq == Bpe.encode(byId(id), model))
      assert(n == toks.length && n > 0)
    }
    // merges are content-addressed: retrain gives identical merges
    val model2 = Bpe.train(docs, "text", nMerges = 30, maxVocab = 1000)
    assert(model2.merges == model.merges)
    // BPE with merges compresses vs raw chars
    val rawChars = byId.values.map(_.count(!_.isWhitespace)).sum
    assert(enc.map(_._3.toLong).sum < rawChars)
  }
}
