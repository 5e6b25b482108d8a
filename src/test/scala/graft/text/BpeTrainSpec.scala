package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins [[TextOps.bpeTrain]] on hand-computed corpora: merge choice
  * (count desc, pair asc), the greedy left-to-right non-overlapping
  * rewrite, post-merge token accounting, and early exhaustion.
  */
class BpeTrainSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def train(texts: Seq[String], rounds: Int = 3) =
    TextOps.bpeTrain(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "text", rounds)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq

  test("two merges then exhaustion; counts weighted by word frequency") {
    // words: aa ×3, ab ×2. Round 1: (a,a)=3 beats (a,b)=2 → merge "aa"
    // (vocab [aa],[a,b] = 3 toks; corpus 3·1+2·2 = 7). Round 2: only
    // (a,b)=2 → merge "ab" (vocab 2; corpus 5). Round 3: no pairs — no
    // row, in engine and oracle alike.
    assert(train(Seq("aa aa ab", "aa ab")) == Seq(
      (1L, "a", "a", 3L, 3L, 7L),
      (2L, "a", "b", 2L, 2L, 5L)))
  }

  test("greedy left-to-right non-overlap: 'aaa' merges to [aa, a]") {
    // Round 1: pairs of [a,a,a] = (a,a) twice (overlap COUNTED) → merge
    // rewrites greedily to [aa, a] (2 toks). Round 2: (aa,a)=1 → [aaa].
    assert(train(Seq("aaa")) == Seq(
      (1L, "a", "a", 2L, 2L, 2L),
      (2L, "aa", "a", 1L, 1L, 1L)))
  }

  test("tie on count breaks to the lexicographically smallest pair") {
    // "ba ca": pairs (b,a)=1, (c,a)=1 → (b,a) wins
    val r = train(Seq("ba ca"), rounds = 1)
    assert(r.head._2 == "b" && r.head._3 == "a" && r.head._4 == 1L)
  }

  test("merged symbols participate in later rounds as single tokens") {
    // "abab" ×2: r1 (a,b)=4 → [ab,ab] (vocab 2 toks, corpus 2·2=4);
    // r2 (ab,ab)=2 → [abab] (vocab 1, corpus 2)
    assert(train(Seq("abab abab")) == Seq(
      (1L, "a", "b", 4L, 2L, 4L),
      (2L, "ab", "ab", 2L, 1L, 2L)))
  }

  private def encode(texts: Seq[String], rounds: Int = 3) =
    TextOps.bpeEncode(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "text", rounds)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("encode: histogram over the post-training vocabulary") {
    // "aa aa ab" + "aa ab": merges (a,a) then (a,b), round 3 exhausted.
    // Vocab: aa→[aa] ×3, ab→[ab] ×2.
    assert(encode(Seq("aa aa ab", "aa ab")) == Seq(
      ("aa", 1L, 3L), ("ab", 1L, 2L)))
  }

  test("encode: per-word token multiplicity is frequency-weighted") {
    // "abab abab" rounds=1: merge (a,b) → each "abab" is [ab, ab]
    // (k=2) with word cnt 2 → n_words 1, n_occ 4.
    assert(encode(Seq("abab abab"), rounds = 1) == Seq(("ab", 1L, 4L)))
  }

  test("encode: unmerged singles survive beside merged symbols") {
    // "ab ba" rounds=1: (a,b)=(b,a)=1, tie → (a,b). Vocab ab→[ab],
    // ba→[b,a]: tokens a, ab, b each in one word, once.
    assert(encode(Seq("ab ba"), rounds = 1) == Seq(
      ("a", 1L, 1L), ("ab", 1L, 1L), ("b", 1L, 1L)))
  }
}
