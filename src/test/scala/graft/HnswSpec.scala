package graft

import graft.operators.Hnsw
import org.apache.spark.sql.functions._

/** Contracts for the sharded HNSW index the q172–q174 gates rely on:
  * measured recall against an exact scan, incremental-insert parity with
  * a full rebuild, level-rule determinism, and partition invariance.
  */
class HnswSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("level rule is the integer geometric(1/4) the oracle mirrors") {
    // levelOf must equal the max L <= 8 with hash60 % 4^L == 0, computed
    // independently via BigInt arithmetic
    (0L until 500L).foreach { id =>
      val h = BigInt(Hnsw.hash60(id))
      val expected = (0 to Hnsw.LevelCap).takeWhile(l =>
        (h mod BigInt(4).pow(l)) == 0).last
      assert(Hnsw.levelOf(id) == expected, s"id=$id")
    }
    // the distribution actually spreads (not all level 0)
    assert((0L until 500L).count(Hnsw.levelOf(_) >= 1) > 50)
  }

  test("exactTopK matches an independently-coded naive cosine top-k") {
    // ADVICE r10: break the shared-code correlation between search and the
    // in-plan exact scan — this recomputes cosine top-k with none of
    // ShardGraph's code (plain Scala doubles, independent sort)
    val rnd = new scala.util.Random(23)
    val vecs = (0L until 300L).map(i =>
      Hnsw.VecRow(i, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val (g, _) = Hnsw.buildShard(vecs.iterator)
    def naiveCos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    vecs.take(15).foreach { q =>
      val naive = vecs.map(v => (naiveCos(q.embedding, v.embedding), v.vec_id))
        .sortBy(t => (-t._1, t._2)).take(Hnsw.K).map(_._2)
      val got = g.exactTopK(q.embedding, Hnsw.K).map(_._1)
      assert(got == naive.toSeq, s"probe ${q.vec_id}")
    }
  }

  test("single-graph recall@10 >= 0.9 against the exact scan") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 800L).map(i =>
      Hnsw.VecRow(i, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val (g, _) = Hnsw.buildShard(vecs.iterator)
    val recalls = vecs.take(40).map { q =>
      val exact = g.exactTopK(q.embedding, Hnsw.K).map(_._1).toSet
      val got = g.search(q.embedding, Hnsw.K, Hnsw.EfS).map(_._1).toSet
      (exact & got).size.toDouble / exact.size
    }
    assert(recalls.forall(_ >= 0.9), s"per-query recalls: $recalls")
    // degree bounds hold everywhere
    assert((0 until g.size).forall(g.degreesOk))
  }

  test("incremental insert: node-set parity with rebuild, contract holds") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 600L).map(i =>
      Hnsw.VecRow(i, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val (rebuilt, _) = Hnsw.buildShard(vecs.iterator)
    val inc = new Hnsw.ShardGraph
    vecs.filter(_.vec_id % 10 != 0).foreach(v => inc.insert(v.vec_id, v.embedding))
    vecs.filter(_.vec_id % 10 == 0).foreach(v => inc.insert(v.vec_id, v.embedding))
    // same node set and identical (hash-derived) levels
    def nodes(g: Hnsw.ShardGraph) =
      (0 until g.size).map(i => g.idOf(i) -> g.levelAt(i)).toMap
    assert(nodes(inc) == nodes(rebuilt))
    // the incrementally-updated graph still clears the recall floor,
    // including for probes FROM the inserted batch
    val probes = vecs.filter(_.vec_id % 10 == 0).take(20) ++ vecs.take(20)
    probes.foreach { q =>
      val exact = inc.exactTopK(q.embedding, Hnsw.K).map(_._1).toSet
      val got = inc.search(q.embedding, Hnsw.K, Hnsw.EfS).map(_._1).toSet
      assert((exact & got).size >= 9, s"probe ${q.vec_id}")
    }
    assert((0 until inc.size).forall(inc.degreesOk))
  }

  // ---- persisted-index contracts (VERDICT r13 #1) ----

  private def randVecs(seed: Int, n: Int): IndexedSeq[Hnsw.VecRow] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i =>
      Hnsw.VecRow(i, Array.fill(64)(rnd.nextGaussian().toFloat)))
  }

  private def canon(rows: Iterator[Hnsw.IndexRow]) =
    rows.map(r => (r.shard, r.vec_id, r.level, r.is_entry,
      r.embedding.toSeq, r.adj.map(_.toSeq).toSeq)).toSeq.sortBy(_._2)

  test("index dump/load round-trip is idempotent: dump∘load∘dump = dump") {
    val vecs = randVecs(31, 500)
    val (g, _) = Hnsw.buildShard(vecs.iterator)
    val dumped = g.toIndexRows(3).toIndexedSeq
    val loaded = new Hnsw.ShardGraph
    loaded.loadFrom(dumped)
    assert(canon(loaded.toIndexRows(3)) == canon(dumped.iterator))
  }

  test("load→search ≡ build→search on the same graph state") {
    val vecs = randVecs(37, 700)
    val (g, _) = Hnsw.buildShard(vecs.iterator)
    val loaded = new Hnsw.ShardGraph
    loaded.loadFrom(g.toIndexRows(0).toIndexedSeq)
    vecs.take(25).foreach { q =>
      assert(loaded.search(q.embedding, Hnsw.K, Hnsw.EfS) ==
        g.search(q.embedding, Hnsw.K, Hnsw.EfS), s"search probe ${q.vec_id}")
      assert(loaded.exactTopK(q.embedding, Hnsw.K + 6) ==
        g.exactTopK(q.embedding, Hnsw.K + 6), s"exact probe ${q.vec_id}")
    }
  }

  test("insert-after-load ≡ continuous incremental build (the q174 path)") {
    val vecs = randVecs(41, 600)
    // continuous: old then new into one in-memory graph (pre-r14 q174)
    val cont = new Hnsw.ShardGraph
    vecs.filter(_.vec_id % 10 != 0).foreach(v => cont.insert(v.vec_id, v.embedding))
    vecs.filter(_.vec_id % 10 == 0).foreach(v => cont.insert(v.vec_id, v.embedding))
    // persisted: base built, dumped, loaded, THEN the batch inserted
    val base = new Hnsw.ShardGraph
    vecs.filter(_.vec_id % 10 != 0).foreach(v => base.insert(v.vec_id, v.embedding))
    val resumed = new Hnsw.ShardGraph
    resumed.loadFrom(base.toIndexRows(0).toIndexedSeq)
    vecs.filter(_.vec_id % 10 == 0).foreach(v => resumed.insert(v.vec_id, v.embedding))
    // identical graph state, not just similar search results
    assert(canon(resumed.toIndexRows(0)) == canon(cont.toIndexRows(0)))
  }

  test("q183 stored-index search equals q173 fresh-build search; re-ensure is a no-op") {
    val tmp = java.nio.file.Files.createTempDirectory("hnswidx").toString
    spark.conf.set(Hnsw.IndexDirConf, tmp)
    try {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      val stored = rows(Hnsw.q183HnswSearchStored.plan(spark, dir))
      val fresh = rows(Hnsw.q173HnswQuery.plan(spark, dir))
      assert(stored == fresh)
      // freshness: a second run must NOT rebuild — parquet mtimes unchanged
      def mtimes = {
        val d = new java.io.File(tmp)
        def walk(f: java.io.File): Seq[(String, Long)] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
          else Seq(f.getPath -> f.lastModified())
        walk(d).sortBy(_._1)
      }
      val before = mtimes
      Hnsw.q183HnswSearchStored.plan(spark, dir).write
        .format("noop").mode("overwrite").save()
      assert(mtimes == before, "re-ensure rewrote a fresh index")
    } finally spark.conf.unset(Hnsw.IndexDirConf)
  }

  test("q172 build gate is partition-invariant and matches the level rule") {
    val base = Hnsw.q172HnswBuild.plan(spark, dir)
      .orderBy("level").collect().map(_.toSeq)
    // the same histogram from a deliberately re-partitioned source is
    // identical (groupByKey shards by vec_id, not physical layout)
    val emb = graft.core.Tables.embeddings(spark, dir).repartition(7)
    val levels = emb.select(col("vec_id")).collect().map(r =>
      Hnsw.levelOf(r.getLong(0)))
    val expected = levels.groupBy(identity).view.mapValues(_.length).toMap
    base.foreach { row =>
      assert(expected(row.head.asInstanceOf[Int]) ==
        row(1).asInstanceOf[Long].toInt)
      assert(row(2).asInstanceOf[Boolean])
    }
  }
}
