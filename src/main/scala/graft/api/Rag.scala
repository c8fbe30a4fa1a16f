package graft.api

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RAG retrieval path — refs J2/J4/J5
  * (`/root/reference/api/ollama_embedder.py:28-44`, `api/main.py:1416-1440`):
  * embed the query, cosine top-k against the corpus embedding table,
  * assemble numbered context snippets with citations.
  *
  * The embedder is a PORT: the reference calls an external HTTP model; the
  * engine takes any `String => Array[Float]`. [[hashEmbedder]] is the
  * deterministic test fake — word-hash buckets, L2-normalized — matching
  * the testdata's 64-dim float vectors.
  */
object Rag {

  val Dim = 64

  /** Deterministic bag-of-words hash embedding (test fake for J2). */
  def hashEmbedder(text: String): Array[Float] = {
    val v = new Array[Float](Dim)
    // one digest instance per call, reset by digest() itself — the
    // per-word getInstance("MD5") provider lookup was ~15M lookups per
    // sf1 ingest for byte-identical output
    val digest = java.security.MessageDigest.getInstance("MD5")
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { w =>
      val md = digest.digest(w.getBytes("UTF-8"))
      val bucket = math.floorMod(md(0) * 256 + (md(1) & 0xff), Dim)
      val sign = if ((md(2) & 1) == 0) 1f else -1f
      v(bucket) += sign
    }
    var ss = 0.0
    var i = 0
    while (i < Dim) { ss += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0) v else v.map(x => (x / n).toFloat)
  }

  /** Reference resilience contract for the embedding port
    * (`api/ollama_embedder.py:5-7,28-45`): `retries` attempts, linear
    * backoff `backoffS * attempt` seconds after EVERY failed attempt
    * (including the last, exactly as the reference's loop sleeps before
    * raising), terminal failure wrapped as "embedding failed after N
    * retries". Serializable so it ships inside [[ingestCorpus]]'s
    * mapPartitions batches — the executor thread is where a real HTTP
    * embedder blocks, so that's where the backoff sleeps. The sleeper is
    * injectable so tests assert the exact schedule without wall-clock
    * sleeping.
    */
  final case class ResilientEmbedder(
      embed: String => Array[Float],
      retries: Int = 4,
      backoffS: Double = 1.5,
      sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong))
    extends (String => Array[Float]) with Serializable {
    def apply(text: String): Array[Float] = {
      var last: Throwable = null
      var attempt = 1
      // a while, not a foreach: `return` inside a lambda is a
      // NonLocalReturnControl throwable that the catch would swallow
      while (attempt <= retries) {
        try return embed(text)
        catch {
          case scala.util.control.NonFatal(e) =>
            last = e
            sleep(backoffS * attempt) // backoff grows linearly per attempt
        }
        attempt += 1
      }
      throw new RuntimeException(
        s"embedding failed after $retries retries: $last")
    }
  }

  /** J4 — cosine top-k retrieval: broadcast the single query vector, rank
    * the corpus by cosine (exact; the LSH-bucketed path is
    * Similarity.lshPairs for corpus-vs-corpus work).
    */
  def topK(corpus: DataFrame, queryVec: Array[Float], k: Int): DataFrame = {
    val kk = math.max(1, math.min(k, 10)) // reference clamp (`api/main.py:1416`)
    val q = lit(queryVec.map(_.toDouble))
    corpus
      .withColumn("sim", round(Similarity.cosine(col("embedding"), q), 6))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(kk)
  }

  /** J5 — context assembly (`api/main.py:1429-1440`): whitespace-collapsed,
    * 700-char-shortened, numbered snippets + citation records.
    */
  final case class Citation(index: Int, source: String, id: Long)

  def assembleContext(
      hits: Seq[(Long, String, String)]): (String, Seq[Citation]) = {
    val snippets = hits.zipWithIndex.map { case ((id, source, text), i) =>
      val collapsed = text.replaceAll("\\s+", " ").trim
      val short =
        if (collapsed.length <= 700) collapsed
        else {
          // shorten at a word boundary; when the first 697 chars hold no
          // space at all (one giant token: URL, base64, CJK) fall back to
          // the hard cut — word-boundary logic must never EMPTY a snippet
          val atWord =
            collapsed.take(697).reverse.dropWhile(c => c != ' ').reverse.trim
          (if (atWord.nonEmpty) atWord else collapsed.take(697)) + "..."
        }
      s"[${i + 1}] $short"
    }
    val cites = hits.zipWithIndex.map { case ((id, source, _), i) =>
      Citation(i + 1, source, id)
    }
    (snippets.mkString("\n\n"), cites)
  }

  final case class ChunkIn(doc_id: Long, chunk_idx: Int, chunk: String, source: String)
  final case class ChunkOut(id: String, doc_id: Long, chunk_idx: Int,
      text: String, source: String, embedding: Array[Float])

  /** J3/A11 — corpus ingestion: chunk → batched embed (batch 16, the
    * reference's embed batching, `api/ingest_docs.py:12-15`, `:85-102`) →
    * content-derived ids `source::p{doc_id}::c{chunk}` (the deterministic
    * `etl/index_docs.py:93` `fname::p{page}::c{j}` scheme, not uuid4 —
    * doc_id plays the page role: it is what distinguishes two documents
    * sharing one source path, exactly as page_num does in the reference;
    * a constant there would collide ids and break upsert-by-id).
    * The result IS the vector store: write it with [[writeStore]]
    * (parquet — A6/A11).
    */
  def ingestCorpus(docs: DataFrame, embed: String => Array[Float],
      size: Int = 200, overlap: Int = 40): DataFrame = {
    import docs.sparkSession.implicits._
    // source rides through the chunker (keep=) instead of equi-joining
    // the corpus back on doc_id — the join exchanged every chunk AND
    // re-scanned the table for a column the chunk row can just carry
    val normedWithSource = docs.select(
      col("doc_id"), col("source"),
      graft.operators.Pipeline.normText(col("text")).as("norm"))
    val chunks = graft.operators.Pipeline
      .chunksOf(normedWithSource, size, overlap, keep = Seq("source"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk"), col("source"))
      .as[ChunkIn]
    chunks.mapPartitions { it =>
      it.grouped(16).flatMap { batch =>
        // a real embedder would send `batch` as one HTTP/model call
        batch.iterator.map { c =>
          ChunkOut(s"${c.source}::p${c.doc_id}::c${c.chunk_idx}", c.doc_id, c.chunk_idx,
            c.chunk, c.source, embed(c.chunk))
        }
      }
    }.toDF()
  }

  /** A6/A11 — the vector-store sink is a parquet table. */
  def writeStore(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Full retrieval: query text → embed → top-k against embeddings joined
    * with their documents → assembled context.
    */
  def retrieve(
      spark: SparkSession,
      documents: DataFrame,
      embeddings: DataFrame,
      query: String,
      k: Int,
      embed: String => Array[Float] = hashEmbedder): (String, Seq[Citation]) = {
    val hits = topK(embeddings, embed(query), k)
      .join(documents, col("vec_id") === documents("doc_id"))
      .select(col("vec_id"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    assembleContext(hits)
  }
}
