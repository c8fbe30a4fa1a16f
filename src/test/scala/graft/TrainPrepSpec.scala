package graft

import graft.operators.TrainPrep
import org.apache.spark.sql.functions._

/** Training-prep operators: decontamination finds exactly the planted
  * overlaps, split assignment is a pure function of the id (stable under
  * repartitioning, ~90/5/5 mass), domain weights rebalance to uniform.
  */
class TrainPrepSpec extends SparkSpec {

  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "norm")
  }

  test("decontaminate flags docs sharing an 8-gram with eval, counts distinct grams") {
    val run = "one two three four five six seven eight" // exactly 8 words
    val eval = mkDocs(Seq(7L -> s"$run benchmark question answer text"))
    val corpus = mkDocs(Seq(
      1L -> s"prefix words here $run and a suffix", // contains the run
      2L -> "completely different text with no overlap at all whatsoever",
      3L -> s"$run $run", // overlapping repeats still = distinct shared grams
    ))
    val got = TrainPrep.decontaminate(corpus, eval).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 3L))
    assert(got(1L) === 1L)
    // doc 3: "run run" has 9 8-grams, but only the two aligned copies of
    // `run` itself appear in eval's gram set → 1 DISTINCT shared gram
    assert(got(3L) === 1L)
  }

  test("decontaminateBloom equals the exact form (no false negatives survive)") {
    val run = "one two three four five six seven eight"
    val eval = mkDocs(Seq(7L -> s"$run benchmark question answer text"))
    val corpus = mkDocs(Seq(
      1L -> s"prefix words here $run and a suffix",
      2L -> "completely different text with no overlap at all whatsoever",
      3L -> s"$run $run",
    ))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = asMap(TrainPrep.decontaminate(corpus, eval))
    val bloom = asMap(TrainPrep.decontaminateBloom(corpus, eval))
    assert(bloom === exact)
    // the corpus side of the sf0.001 catalog form agrees too (richer grams)
    val norm = graft.operators.Pipeline.normDocs(
      graft.core.Tables.documents(spark, "/root/testdata/sf0.001"))
    val isEval = col("doc_id") % 7 === 0
    val e2 = asMap(TrainPrep.decontaminate(norm.filter(!isEval), norm.filter(isEval)))
    val b2 = asMap(TrainPrep.decontaminateBloom(norm.filter(!isEval), norm.filter(isEval)))
    assert(b2 === e2)
  }

  test("splitAssign is deterministic, partition-invariant, and ~90/5/5") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
    val a = TrainPrep.splitAssign(docs).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = TrainPrep.splitAssign(docs.repartition(17)).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b) // pure function of the id — no RNG, no partition effects
    val n = a.size.toDouble
    val shares = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(shares("train") - 0.9) < 0.03)
    assert(math.abs(shares("val") - 0.05) < 0.02)
    assert(math.abs(shares("test") - 0.05) < 0.02)
  }

  test("domainMix weights rebalance token mass to a uniform source mix") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
    val rows = TrainPrep.domainMix(docs).collect()
    val shares = rows.map(_.getDouble(3))
    assert(math.abs(shares.sum - 1.0) < 1e-3)
    // weight * actual_share == uniform share for every source
    val k = rows.length
    rows.foreach { r =>
      assert(math.abs(r.getDouble(4) * r.getDouble(3) - 1.0 / k) < 1e-4)
    }
  }

  test("packSequences: in-budget offsets, chained cumsum per bucket, partition-invariant") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
    val rows = TrainPrep.packSequences(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    val B = TrainPrep.PackBudget
    rows.foreach { case (_, _, _, _, off) => assert(off >= 0 && off < B) }
    // within each bucket, docs in id order tile the concat stream exactly:
    // next doc's global token offset = previous offset + previous n_tokens
    rows.groupBy(_._2).foreach { case (bucket, rs) =>
      val bIdx = java.lang.Long.parseLong(bucket, 16)
      var cum = 0L
      rs.sortBy(_._1).foreach { case (_, _, n, packId, off) =>
        assert(packId === bIdx * 1099511627776L + cum / B)
        assert(off === cum % B)
        cum += n
      }
    }
    // no RNG, no partition effects
    val again = TrainPrep.packSequences(docs.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    assert(again === rows.map(r => (r._1, r._4, r._5)).toSet)
  }

  test("stratifiedSample: per-language rates land near targets, deterministic") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TrainPrep.stratifiedSample(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    TrainPrep.StratRates.foreach { case (lang, _, rate) =>
      val got = kept.getOrElse(lang, 0L).toDouble / total(lang)
      assert(math.abs(got - rate) < 0.06, s"$lang: got $got want ~$rate")
    }
    val again = TrainPrep.stratifiedSample(docs.repartition(7)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === kept)
  }

  test("groupSample: two-phase top-k is exact and partitioning-invariant") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    // reference: the same selection with a single global window per source
    val ref = TrainPrep.groupSample(docs.repartition(1), 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // many partitions: phase 1 must prune without changing the answer
    Seq(4, 13, 32).foreach { p =>
      val got = TrainPrep.groupSample(docs.repartition(p), 5).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === ref, s"selection changed at $p partitions")
    }
    assert(ref.size === 15) // 3 sources × k
    assert(ref.groupBy(_._1).values.forall(_.map(_._3).toSeq.sorted == (1 to 5)))
  }

  test("temperatureMix: weights renormalize sqrt shares; minority boosted") {
    import spark.implicits._
    // 3 one-token docs vs 12: shares 0.2 / 0.8
    val docs = (
      (1 to 3).map(i => (i.toLong, "word", "small")) ++
      (4 to 15).map(i => (i.toLong, "word", "big"))
    ).toDF("doc_id", "text", "source")
    val got = TrainPrep.temperatureMix(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val z = math.sqrt(0.2) + math.sqrt(0.8)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got("small").getDouble(3) === 0.2)
    assert(got("small").getDouble(4) === r6(math.sqrt(0.2) / z))
    assert(got("big").getDouble(4) === r6(math.sqrt(0.8) / z))
    // weights sum to 1 (rounded); minority boosted above 1, majority damped
    assert(math.abs(got.values.map(_.getDouble(4)).sum - 1.0) < 2e-6)
    assert(got("small").getDouble(5) > 1.0 && got("big").getDouble(5) < 1.0)
  }

  test("corpusVerdict: each gate sets its own bit; eval docs excluded") {
    import spark.implicits._
    val clean = (("the and of to a " * 6) + ("wonderful " * 10)).trim
    val evalTxt = "the and cat dog fox run hop sit lie now" // doc 7 = eval
    val docs = Seq(
      (1L, clean),                                // kept
      (2L, clean),                                // exact dup of 1
      (3L, evalTxt + (" wonderful" * 30)),        // shares 8-grams with eval
      (4L, "tiny"),                               // fails the quality gate
      (7L, evalTxt),                              // the benchmark doc itself
    ).toDF("doc_id", "text")
    val got = TrainPrep.corpusVerdict(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(7L), "eval docs must not appear in the verdict")
    assert(got(1L).getInt(4) === 0 && got(1L).getBoolean(5))
    assert(got(2L).getInt(4) === 2 && got(2L).getBoolean(2)) // dup bit
    assert(got(3L).getInt(4) === 4 && got(3L).getBoolean(3)) // contam bit
    assert(got(4L).getInt(4) === 1 && got(4L).getBoolean(1)) // quality bit
    assert(Seq(2L, 3L, 4L).forall(i => !got(i).getBoolean(5)))
  }

  test("weightedSample: exact A-ES selection, partition-invariant, size-biased") {
    import spark.implicits._
    // long docs (weight 1000) vs short (weight 10): the race keys
    // -ln(u)/w make long docs ~100x more likely per draw
    val docs = (1L to 200L)
      .map(i => (i, if (i <= 100) 1000L else 10L))
      .toDF("doc_id", "n_chars")
    val ref = TrainPrep.weightedSample(docs.repartition(1), 40).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    Seq(7, 32).foreach { p =>
      val got = TrainPrep.weightedSample(docs.repartition(p), 40).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === ref, s"selection changed at $p partitions")
    }
    assert(ref.size === 40)
    // size bias: the heavy half must dominate the draw
    val heavy = ref.count(_._2 == 1000L)
    assert(heavy >= 35, s"expected heavy docs to dominate, got $heavy/40")
    // exactness: matches the brute-force k-smallest-key computation
    val brute = (1L to 200L).map { i =>
      val h = TrainPrep.hashOf(s"ws-$i")
      val u = (h + 1).toDouble / 1152921504606846976.0
      val w = if (i <= 100) 1000L else 10L
      (i, -math.log(u) / w)
    }.sortBy(t => (t._2, t._1)).take(40).map(_._1).toSet
    assert(ref.map(_._1) === brute)
  }

  test("epochShuffle: two-level rank equals the naive global-window rank") {
    import spark.implicits._
    val docs = (1L to 400L).map(Tuple1(_)).toDF("doc_id")
    val got = TrainPrep.epochShuffle(docs.repartition(13), 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // naive reference: per-shard sort of the same hash keys
    val keyed = (1L to 400L).map(i => (i, TrainPrep.hashOf(s"ep1-$i")))
    val ref = keyed.groupBy(_._2 % 8).flatMap { case (shard, rows) =>
      rows.sortBy(t => (t._2, t._1)).zipWithIndex.map { case ((id, _), k) =>
        (id, shard.toInt, k + 1)
      }
    }.toSet
    assert(got === ref)
    // every shard's positions are a contiguous 1..n permutation
    got.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).toSeq.sorted === (1 to rows.size))
    }
  }

  test("mixApply: per-source draws hit floor(weight*budget), stable under repartition") {
    import spark.implicits._
    // big source has 9x the tokens; temperature damps it: weights go
    // sqrt(0.1)/z and sqrt(0.9)/z instead of 0.1/0.9
    val docs = (
      (1 to 20).map(i => (i.toLong, "word", "small")) ++
      (21 to 200).map(i => (i.toLong, "word", "big"))
    ).toDF("doc_id", "text", "source")
    val got = TrainPrep.mixApply(docs, 100).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val bySrc = got.groupBy(_._1).view.mapValues(_.size).toMap
    val z = math.sqrt(0.1) + math.sqrt(0.9)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val wantSmall = math.floor(r6(math.sqrt(0.1) / z) * 100).toInt
    val wantBig = math.floor(r6(math.sqrt(0.9) / z) * 100).toInt
    assert(bySrc("small") === math.min(wantSmall, 20))
    assert(bySrc("big") === wantBig)
    val again = TrainPrep.mixApply(docs.repartition(23), 100).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(again.toSet === got.toSet)
  }
}
