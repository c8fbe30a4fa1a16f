package graft

import graft.api.Rag
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentHashMap

/** The embedding port's resilience contract
  * (`/root/reference/api/ollama_embedder.py:5-7,28-45`): RETRIES=4 linear
  * backoff BACKOFF*attempt, sleep after every failed attempt (including the
  * last), terminal RuntimeError wrapping the last cause — proven on the
  * driver for the schedule and through the distributed ingestCorpus path
  * for transient executor-side failures.
  */
class EmbedderResilienceSpec extends SparkSpec {

  test("transient failures retry with the reference's linear backoff schedule") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Double]()
    var calls = 0
    val flaky: String => Array[Float] = t => {
      calls += 1
      if (calls <= 2) throw new RuntimeException(s"boom $calls")
      Rag.hashEmbedder(t)
    }
    val e = Rag.ResilientEmbedder(flaky, sleep = sleeps.append(_))
    val got = e("hello world")
    assert(got === Rag.hashEmbedder("hello world"))
    assert(calls === 3)
    assert(sleeps.toSeq === Seq(1.5, 3.0)) // BACKOFF * attempt
  }

  test("terminal failure after RETRIES attempts wraps the last cause; sleeps all 4 times") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Double]()
    val dead: String => Array[Float] = _ => throw new RuntimeException("down")
    val e = Rag.ResilientEmbedder(dead, sleep = sleeps.append(_))
    val ex = intercept[RuntimeException](e("x"))
    assert(ex.getMessage.startsWith("embedding failed after 4 retries"))
    assert(ex.getMessage.contains("down"))
    // the reference's loop sleeps BEFORE raising, on the last attempt too
    assert(sleeps.toSeq === Seq(1.5, 3.0, 4.5, 6.0))
  }

  test("ingestCorpus with a flaky executor-side embedder matches the clean run") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(40).select(col("doc_id"), col("text"),
        concat(lit("doc"), col("doc_id")).as("source"))
    val clean = Rag.ingestCorpus(docs, Rag.hashEmbedder)
      .select("id", "embedding").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    val flakyGot = Rag.ingestCorpus(docs,
        Rag.ResilientEmbedder(EmbedderResilienceSpec.flakyOncePerChunk,
          sleep = _ => ()))
      .select("id", "embedding").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(flakyGot === clean)
    assert(EmbedderResilienceSpec.failed.size > 0) // failures actually happened
  }
}

object EmbedderResilienceSpec {
  /** Fails the FIRST embed call for every distinct chunk (executor-side
    * static state — local[n] runs tasks in one JVM). */
  val failed = new ConcurrentHashMap[String, Boolean]()
  val flakyOncePerChunk: String => Array[Float] = t => {
    if (failed.putIfAbsent(t, true) == null) throw new RuntimeException("transient")
    Rag.hashEmbedder(t)
  }
}
