package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.text.TextOps

/** Pins the late-round-4 curation operators: Bloom-prefiltered
  * incremental dedup (q83), deterministic stratified split (q84),
  * exact-integer Zipf mass (q85), per-domain boilerplate (q86).
  */
class CurationOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("incrementalBloom ≡ incremental on the same snapshot/batch split") {
    val docs = (0L until 200L).map { i =>
      // duplicate cluster every 5 ids; some texts exist only in batch
      (i, s"text ${if (i % 5 == 0) "dup shared" else s"unique $i"}")
    }.toDF("doc_id", "text")
    val snap = docs.filter($"doc_id" % 3 === 0)
    val batch = docs.filter($"doc_id" % 3 =!= 0)
    val exact = Dedup.incremental(snap, batch, "doc_id", "text")
      .orderBy("text_md5").collect().toSeq
    val bloom = Dedup.incrementalBloom(snap, batch, "doc_id", "text")
      .orderBy("text_md5").collect().toSeq
    assert(bloom == exact)
    assert(bloom.nonEmpty)
  }

  test("incrementalBloom: tiny sketch (max false positives) stays exact") {
    val docs = (0L until 300L).map(i => (i, s"t ${i % 40}"))
      .toDF("doc_id", "text")
    val snap = docs.filter($"doc_id" % 3 === 0)
    val batch = docs.filter($"doc_id" % 3 =!= 0)
    val exact = Dedup.incremental(snap, batch, "doc_id", "text")
      .orderBy("text_md5").collect().toSeq
    // 8 bits total: nearly every probe reports might-contain
    val bloom = Dedup.incrementalBloom(snap, batch, "doc_id", "text",
      estimatedItems = 2L, numBits = 8L)
      .orderBy("text_md5").collect().toSeq
    assert(bloom == exact)
  }

  test("incrementalBloom: empty batch yields no rows") {
    val docs = (0L until 10L).map(i => (i, s"x $i")).toDF("doc_id", "text")
    val out = Dedup.incrementalBloom(
      docs, docs.limit(0), "doc_id", "text")
    assert(out.count() == 0L)
  }

  test("stratifiedSplit: deterministic, content-keyed, all rows covered") {
    val docs = (0L until 1000L).map(i => (i, s"doc body $i"))
      .toDF("doc_id", "text")
    val a = TextOps.stratifiedSplit(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    val b = TextOps.stratifiedSplit(docs.repartition(7), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)              // partitioning-independent
    assert(a.length == 1000)
    val bySplit = a.groupBy(_._3).view.mapValues(_.length).toMap
    // ~98/1/1: loose bounds, but all three strata must be hit
    assert(bySplit.keySet == Set("train", "valid", "test"))
    assert(bySplit("train") > 900)
    a.foreach { case (_, bucket, split) =>
      val want = if (bucket < 980) "train"
        else if (bucket < 990) "valid" else "test"
      assert(split == want)
    }
  }

  test("zipfMass: hand-computed bit lengths, zero-token doc emits zeros") {
    val docs = Seq(
      (1L, "a a b"),   // a:2 within doc; corpus c(a)=3, c(b)=1
      (2L, "a c"),     // c(c)=1
      (3L, "")         // zero tokens
    ).toDF("doc_id", "text")
    // corpus counts: a=3 (bitlen 2), b=1 (bitlen 1), c=1 (bitlen 1)
    val r = TextOps.zipfMass(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      (1L, 3L, 2L, 2L * 2 + 1L * 1), // a twice (2 bits each) + b once
      (2L, 2L, 2L, 2L + 1L),         // a + c
      (3L, 0L, 0L, 0L)))
  }

  test("zipfMass: head/tail join split covers every term exactly once") {
    val docs = (0L until 50L)
      .map(i => (i, s"common ${"common " * (i % 3).toInt}rare$i"))
      .toDF("doc_id", "text")
    // headK=1 puts only 'common' in the broadcast head; all rare terms
    // take the shuffle-tail path — totals must still match a plain join
    val split = TextOps.zipfMass(docs, "doc_id", "text", headK = 1)
      .orderBy("doc_id").collect().toSeq
    val plain = TextOps.zipfMass(docs, "doc_id", "text", headK = 100000)
      .orderBy("doc_id").collect().toSeq
    assert(split == plain)
  }

  test("bigramLmBits: hand-computed conditional bits; predictable beats " +
      "gibberish; zero rows for <2 tokens") {
    val docs = Seq(
      (1L, "a b a b a b"), // bigrams: ab×3, ba×2
      (2L, "a b"),         // ab×1
      (3L, "x y"),         // xy×1
      (4L, "solo"),        // 1 token → zeros
      (5L, "")             // 0 tokens → zeros
    ).toDF("doc_id", "text")
    // corpus: c(ab)=4, c(ba)=2, c(xy)=1; c(a·)=4, c(b·)=2, c(x·)=1
    def bl(n: Long) = 64L - java.lang.Long.numberOfLeadingZeros(n)
    val r = TextOps.bigramLmBits(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val d1 = 3L * (bl(4) - bl(4)) + 2L * (bl(2) - bl(2)) // 0: fully predictable
    val d2 = bl(4) - bl(4)
    val d3 = bl(1) - bl(1)
    assert(r.toSeq == Seq((1L, 5L, d1), (2L, 1L, d2), (3L, 1L, d3),
      (4L, 0L, 0L), (5L, 0L, 0L)))
    // a doc whose bigrams are corpus-unique scores below one whose
    // bigrams are corpus-frequent (the filter's discriminating direction)
    val docs2 = (0L until 20L).map(i => (i, "the same phrase again"))
      .toDF("doc_id", "text")
      .unionAll(Seq((100L, "same the again phrase")).toDF("doc_id", "text"))
    val scores = TextOps.bigramLmBits(docs2, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(2))).toMap
    assert(scores(0L) > scores(100L))
    // head/tail split covers every key exactly once
    val split = TextOps.bigramLmBits(docs2, "doc_id", "text", headK = 1)
      .orderBy("doc_id").collect().toSeq
    val plain = TextOps.bigramLmBits(docs2, "doc_id", "text", headK = 100000)
      .orderBy("doc_id").collect().toSeq
    assert(split == plain)
  }

  test("boilerplateStats: repeated 5-gram flagged within its source only") {
    val boiler = "cookie notice applies to this site"  // 6 tokens → 2 grams
    val docs = Seq(
      (1L, "s1", s"$boiler alpha beta gamma delta"),
      (2L, "s1", s"$boiler epsilon zeta eta theta"),
      (3L, "s1", s"$boiler iota kappa lambda mu"),
      (4L, "s2", s"$boiler nu xi omicron pi")   // same grams, other source
    ).toDF("doc_id", "source", "text")
    val r = TextOps.boilerplateStats(docs, "doc_id", "source", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // each doc has 10 tokens → 6 distinct 5-grams; within s1 the two
    // all-boiler grams appear in 3 docs (>= minDocs) → n_boiler = 2
    r.take(3).foreach { case (_, nGrams, nBoiler, ppm) =>
      assert(nGrams == 6L)
      assert(nBoiler == 2L)
      assert(ppm == 2L * 1000000 / 6)
    }
    // s2 has a single doc: nothing reaches doc-frequency 3
    assert(r(3) == ((4L, 6L, 0L, 0L)))
  }

  test("dsirWeights: hand-computed bit ratios, zeros for empty docs") {
    // target sample = doc_id % 5 == 0 → docs 0 and 5
    val docs = Seq(
      (0L, "tgtword tgtword"), // ct=2 cr=2 → per-occ bitlen(3)-bitlen(3)=0
      (1L, "rawword"),         // ct=0 cr=1 → bitlen(1)-bitlen(2) = -1
      (5L, "both"),            // ct=1 cr=2 → bitlen(2)-bitlen(3) = 0
      (2L, "both"),
      (3L, "")                 // zero tokens
    ).toDF("doc_id", "text")
    // 3 distinct terms in 4096 buckets: no collisions (deterministic
    // hash — if this assertion holds once it holds always)
    val nb = docs.select(explode(split($"text", " ")).as("t"))
      .filter($"t" =!= "")
      .select((Dedup.md5h32($"t") % 4096).as("b")).distinct.count()
    assert(nb == 3L)
    val r = TextOps.dsirWeights(docs, "doc_id", "text", $"doc_id" % 5 === 0)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(
      (0L, 2L, 0L), (1L, 1L, -1L), (2L, 1L, 0L), (3L, 0L, 0L),
      (5L, 1L, 0L)))
  }

  test("dsirWeights: partitioning-independent, raw-only terms score below") {
    val docs = (0L until 200L).map { i =>
      val w = if (i % 5 == 0) "trusted clean prose" else "spam junk noise"
      (i, s"$w shared$i")
    }.toDF("doc_id", "text")
    val a = TextOps.dsirWeights(docs, "doc_id", "text", $"doc_id" % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val b = TextOps.dsirWeights(
      docs.repartition(7), "doc_id", "text", $"doc_id" % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    // target docs' vocabulary matches the target distribution: strictly
    // higher score than the raw-only docs
    val tgtMin = a.filter(_._1 % 5 == 0).map(_._3).min
    val rawMax = a.filter(_._1 % 5 != 0).map(_._3).max
    assert(tgtMin > rawMax)
  }

  test("shuffleShards: dense (shard,pos), matches independent hash sort") {
    val docs = (0L until 2500L).map(i => (i, s"payload $i"))
      .toDF("doc_id", "text")
    val out = TextOps.shuffleShards(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 2500)
    // shard sizes 1000/1000/500, every (shard,pos) unique
    val byShard = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byShard == Map(0L -> 1000, 1L -> 1000, 2L -> 500))
    assert(out.map(r => (r._3, r._4)).distinct.length == 2500)
    // global order = sort by (h, doc_id) computed independently
    val want = docs.select($"doc_id",
      Dedup.md5h32(concat($"doc_id".cast("string"), lit(":"), $"text"))
        .as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._2, t._1))
      .zipWithIndex
      .map { case ((id, h), i) => (id, h, i / 1000L, i % 1000L) }
    assert(out.sortBy(t => (t._3, t._4)).toSeq == want.toSeq)
  }

  test("shuffleShards: permutation is partitioning-independent") {
    val docs = (0L until 600L).map(i => (i, s"p $i")).toDF("doc_id", "text")
    val a = TextOps.shuffleShards(docs, "doc_id", "text", 64L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val b = TextOps.shuffleShards(docs.repartition(11), "doc_id", "text", 64L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }
}
