package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the corpus-mix analytics family
  * (`Llm.sourceKlMix` / `Llm.vocabStats`, E119/E121): per-source mix
  * statistics maintained over a live DOCUMENT FEED (the crawler
  * ingest), so the sampling recipe can be rebalanced while data
  * arrives instead of after the next batch sweep.
  *
  * Contract: one complete-mode aggregation per source — document
  * count, token volume, and approximate vocabulary — over the
  * map-side token explode of the feed. The SAME plan runs in batch
  * (that is the gate: stream result ≡ batch aggregation over the
  * union of every fed micro-batch).
  *
  * Scale/state story: the only streaming state is ONE row per source
  * holding two counters and two HLL sketches — O(sources · sketch)
  * bytes, bounded regardless of feed length (an exact streaming
  * vocabulary would grow state by one row per distinct token, i.e.
  * corpus-unbounded; the batch path owns exact vocab, the stream owns
  * the bounded approximation — same split as the q42/q65 profile
  * sketches). HLL register-max merge is order- and
  * batching-independent, which is exactly why stream ≡ batch holds
  * EXACTLY, not approximately: both sides build the identical sketch.
  * The token explode never enters state — it streams into the
  * partial aggregation map-side, mirroring how the batch plan keeps
  * the corpus out of the exchange. */
object MixMonitor {

  /** Per-source mix statistics of a (streaming or batch) documents
    * frame with columns (doc_id, source, text): n_docs, n_tokens,
    * approx vocabulary, and mean tokens/doc in integer micro units
    * (exact integer division — engine-portable). */
  def mixStats(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"))
      .agg(
        approx_count_distinct(col("doc_id")).as("n_docs_approx"),
        count(lit(1)).as("n_tokens"),
        approx_count_distinct(col("token")).as("vocab_approx"))
      .withColumn("tokens_per_doc_micro",
        expr("n_tokens * 1000000L div greatest(n_docs_approx, 1L)"))
}
