package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}
import graft.Tables
import graft.functions.GraftFx

/** The SIMILARITY-SEARCH families of [[Llm]] (SURVEY §2.9 X3), split
  * along the file's stable seams (r11 verdict task 5 — a pure move,
  * no semantic change; the public surface stays `Llm.*` via the
  * mixin): brute-force / IVF / filtered / LSH serve paths, random-
  * projection dimensionality reduction, incremental aggregate
  * maintenance, scalar quantization, product quantization (PQ-ADC),
  * and residual PQ (IVFADC) with their delete-aware IndexStore
  * chains. */
trait LlmAnnOps {
  // ---- similarity search (X3) ------------------------------------------

  /** Codegen'd sequential dot product ([[GraftFx.dot]]) — same fold
    * order as DuckDB `list_dot_product`, so rounded cosines match. */
  protected def dot(a: Column, b: Column): Column = GraftFx.dot(a, b)

  /** Embeddings with double-cast vector and precomputed L2 norm. */
  protected def vectors(s: SparkSession, dir: String): DataFrame =
    Llm.embs(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** Brute-force cosine top-k baseline: 10 broadcast query vectors
    * against the full table — a broadcast nested-loop where the *big*
    * side streams once and never shuffles; top-k per query via window.
    * This is the exact baseline the IVF variant (q38) approximates. */
  def topkCosine(s: SparkSession, dir: String): DataFrame = {
    val e = vectors(s, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos",
        dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank").cast("bigint").as("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Lloyd-iteration budget for the IVF coarse quantizer. The DuckDB
    * oracle unrolls EXACTLY this many update steps as a CTE chain; the
    * Scala side may stop earlier at a fixpoint — a converged Lloyd
    * update is the identity (same members ⇒ same rounded means ⇒ same
    * assignment), so the oracle's extra unrolled iterations are no-ops
    * and both engines agree on the final centroids. */
  private[graft] val kmeansMaxIters = 8

  /** Assign every vector to its argmax-cosine centroid: broadcast
    * nested-loop of the full table against the (tiny) centroid model —
    * the big side streams once and never shuffles. */
  private[graft] def assignToCentroids(e: DataFrame, cent: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    e.crossJoin(broadcast(cent))
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
  }

  /** (cid, cv) rows → centroid model frame with the derived L2 norm.
    * The norm comes from the ROUNDED centroid values, so it is
    * bit-identical on any engine that reads the same artifact. */
  private[graft] def centroidFrame(
      s: SparkSession, cent: Seq[(Long, Seq[Double])]): DataFrame = {
    import s.implicits._
    cent.toDF("cid", "cv")
      .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
  }

  /** IVF init stride derived from corpus size: every `stride`-th vector
    * seeds a centroid, with stride ≈ √n so nlist ≈ √n — the standard
    * IVF geometry (probe cost and per-cluster scan cost balance at
    * √n·√n). A FIXED stride makes nlist ∝ n: at 10⁹ vectors that is
    * 25 M centroids, which no longer broadcasts and makes the
    * assignment nested-loop O(n·nlist) = O(n²/40) — the same class of
    * fixture-tuned constant the round-2 verdict flagged for the
    * near-dup family. Floored at 40 so tiny fixtures keep stable
    * semantics; the DuckDB oracles embed the same formula. */
  private[graft] def ivfStride(nVecs: Long): Long =
    math.max(40L, math.sqrt(nVecs.toDouble).toLong)

  protected val ivfStrideSql: String =
    "greatest(40, CAST(floor(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT))"

  /** Probe budget from quantizer size: nprobe ≈ nlist/16 (floored at 3)
    * keeps the probed fraction of the corpus roughly constant as nlist
    * grows, instead of a fixed 3 probes whose coverage → 0 at scale. */
  private[graft] def ivfNprobe(nlist: Long): Long =
    math.max(3L, nlist / 16)

  /** Deterministic k-means init: every [[ivfStride]]-th vector. */
  private[graft] def initCentroids(s: SparkSession, dir: String): Seq[(Long, Seq[Double])] = {
    import s.implicits._
    val stride = ivfStride(Llm.embs(s, dir).count())
    vectors(s, dir).filter(col("vec_id") % stride === 0)
      .select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
      .collect().sortBy(_._1).toSeq
  }

  /** Train the IVF coarse quantizer: iterated Lloyd/k-means from the
    * deterministic every-40th init, stopping at the assignment fixpoint
    * or after [[kmeansMaxIters]] updates. Each update runs ONE
    * distributed pass (broadcast assignment + mergeable
    * [[graft.functions.VectorAgg.vectorSum]] partial agg — dim-length
    * buffers through the shuffle, no 64× explosion); only the
    * O(nlist·dim) centroid MODEL is collected per round — the classic
    * k-means driver loop (what MLlib KMeans does), independent of
    * corpus size. Centroids are rounded to 6 dp after every update so
    * the model is engine-portable: the oracle's unrolled SQL re-derives
    * bit-identical centroids, and each round's rounding re-synchronizes
    * any last-bit summation-order drift before it can compound. */
  protected def computeIvfCentroids(s: SparkSession, dir: String): Seq[(Long, Seq[Double])] = {
    import s.implicits._
    val vsum = udaf(graft.functions.VectorAgg.vectorSum,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
    val e = vectors(s, dir).localCheckpoint()
    var cent = initCentroids(s, dir)
    var it = 0
    var converged = false
    while (it < kmeansMaxIters && !converged) {
      val next = assignToCentroids(e, centroidFrame(s, cent))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n"), vsum(col("v")).as("sv"))
        .select(col("cid"),
          expr("transform(sv, x -> round(x / n, 6))").as("cv"))
        .as[(Long, Seq[Double])]
        .collect().sortBy(_._1).toSeq
      converged = next == cent
      cent = next
      it += 1
    }
    cent
  }

  /** Drift guard for incremental IVF maintenance: a pure append may
    * route its new vectors against the FROZEN quantizer (map-only, no
    * retrain — centroids simply stop reflecting the newest slice) as
    * long as the appended slice stays a small fraction of the indexed
    * corpus; past 20% the quantizer is considered drifted and the whole
    * index retrains. Both IVF artifacts evaluate this on the SAME
    * (nOld, nAdded) pair, so the quantizer and the assignment always
    * make the same freeze-or-retrain decision — a frozen-centroid
    * delta against retrained centroids would corrupt the chain. */
  private[graft] def ivfDriftRetrain(nOld: Long, nAdded: Long): Boolean =
    nAdded.toDouble > 0.2 * math.max(1L, nOld).toDouble

  /** Deletion analog of [[ivfDriftRetrain]], shared by every trained
    * model's `carryOnDelete` accept rule: a PURE takedown whose byte
    * mass stays within 20% of the surviving corpus freezes the model
    * at the new source state (the trained quantizer remains a valid
    * quantizer of the survivors — for SQ8 scales exactly: a max can
    * only shrink); a larger deletion, or a mixed delete+append, moved
    * enough distribution mass that the freeze declines and the next
    * read retrains. Deleted rows cannot be COUNTED — the files are
    * gone — so the manifest's recorded byte sizes are the drift proxy
    * (parquet bytes scale with rows at fixed schema). */
  protected def modelCarryAccept(s: SparkSession, src: String)(
      deleted: Seq[String], added: Seq[String]): Boolean =
    added.isEmpty && {
      val deletedBytes = deleted.map(_.split('|')(1).toLong).sum
      val p = new org.apache.hadoop.fs.Path(src)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val surviving =
        if (f.exists(p)) f.getContentSummary(p).getLength else 0L
      deletedBytes.toDouble <= 0.2 * math.max(1L, surviving).toDouble
    }

  /** True when the model artifact serving `src`'s CURRENT state is
    * the SAME trained model as the previous state's — append-frozen
    * (delta chain) or delete-carried (`_FROZEN`). The code chains'
    * carry gate: excising/appending per-vector codes is sound only
    * under an unchanged model. */
  protected def modelCarried(s: SparkSession, name: String, src: String,
      version: Int): Boolean =
    graft.observe.IndexStore.isChained(s, name, src, version) ||
      graft.observe.IndexStore.frozenFrom(s, name, src, version).nonEmpty

  /** Trained centroid model, persisted as the `ivf_centroids` artifact:
    * the quantizer is built once per warehouse state and shared by
    * probe top-k (q38), bucketed near-dup (q39), and the update step
    * (q64). Only (cid, cv) is stored; the norm is re-derived from the
    * rounded values on read, so it is identical on any engine.
    *
    * Incremental maintenance (snapshot chain): a small pure append
    * FREEZES the quantizer — the delta segment is empty, so the chain
    * read serves the previous model unchanged — while a large append
    * (see [[ivfDriftRetrain]]) declines the delta and retrains. At
    * 100 TB this is how a trained ANN index actually lives: routing
    * new data is cheap and continuous, retraining is a deliberate,
    * threshold-gated event. */
  /** Artifact logic versions — single-sourced so a bump can never
    * desynchronize a build site from its downstream `isChained`
    * consistency check (a missed literal would chain codes onto a
    * retrained model). v2 of the IVF family: stride/nprobe derived
    * from corpus size. */
  private[graft] val ivfArtifactVersion = 2
  private[graft] val sq8ArtifactVersion = 1
  private[graft] val pqArtifactVersion = 1

  private[graft] def ivfCentroids(s: SparkSession, dir: String): DataFrame = {
    // deletion lifecycle: a sub-drift pure takedown FREEZES the
    // trained quantizer at the surviving state (zero recompute — the
    // model is centroid-table-sized), so downstream code chains can
    // excise; past the drift bound the carry declines and the full
    // build below retrains (the cascade)
    graft.observe.IndexStore.carryOnDelete(
      s, "ivf_centroids", Llm.embsSrc(dir), ivfArtifactVersion)(
      modelCarryAccept(s, Llm.embsSrc(dir)))
    graft.observe.IndexStore.readOrBuildIncremental(
      s, "ivf_centroids", Llm.embsSrc(dir),
      version = ivfArtifactVersion)(
      {
        val sess = s
        import sess.implicits._
        computeIvfCentroids(s, dir).toDF("cid", "cv")
      })(
      (prev, added) => {
        val nAdded = s.read.parquet(added: _*).count()
        val nTotal = Llm.embs(s, dir).count() // parquet-metadata count
        if (ivfDriftRetrain(nTotal - nAdded, nAdded)) null // retrain
        else prev.limit(0) // frozen: the chain serves the old model
      }).withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
  }

  /** Map-only frozen-quantizer assignment: fold-argmax over the
    * broadcast centroid model (same expression as [[vectorRouting]],
    * which LlmSpec proves tie-break-identical to the window-rank
    * [[assignToCentroids]]), emitting the cluster-table schema
    * (vec_id, v, nrm, cid) so delta segments union with full builds. */
  protected def routeFrozen(s: SparkSession, vecs: DataFrame, cent: DataFrame): DataFrame = {
    import s.implicits._
    val model = Seq(Tuple1(
      cent.select(col("cid"), col("cv"), col("cn"))
        .as[(Long, Seq[Double], Double)]
        .collect().sortBy(_._1).toSeq)).toDF("cs")
    vecs.crossJoin(broadcast(model))
      .withColumn("best", aggregate(
        col("cs"),
        struct(lit(-1L).as("cid"), lit(-2.0).as("cos")),
        (acc, c) => {
          val cos = dot(c.getField("_2"), col("v")) /
            (c.getField("_3") * col("nrm"))
          when(cos > acc.getField("cos"),
            struct(c.getField("_1").as("cid"), cos.as("cos")))
            .otherwise(acc)
        }))
      .select(col("vec_id"), col("v"), col("nrm"), col("best.cid").as("cid"))
  }

  /** IVF cluster assignment against the TRAINED centroids — the
    * "inverted file" artifact consumed by three queries (probe top-k
    * q38, bucketed near-dup q39, centroid update q64). Persisting it
    * once per warehouse state, not once per query, is exactly how the
    * index lives at 100 TB (partitioned by `cid` on the object store);
    * readers get a plain parquet scan with no session-bound handles.
    *
    * Lifecycle (SEGMENTED + model-gated, E157): per-vector assignment
    * against a frozen quantizer is independent row math (LlmSpec
    * proves [[routeFrozen]] tie-break-identical to the window-rank
    * [[assignToCentroids]]), so the assignment table is
    * file-decomposable — a sub-drift append routes ONLY the appended
    * vectors into a chained delta, and a sub-drift TAKEDOWN excises
    * only the touched segments (the quantizer carries frozen across
    * the deletion via [[ivfCentroids]]' `carryOnDelete`). The carry
    * gate declines whenever the quantizer did NOT freeze at this
    * source transition — a drift-sized append or deletion retrains
    * the model and cascades into a full reassignment, because mixing
    * old-model reused segments with new-model rebuilt ones would be
    * silently inconsistent. */
  private[graft] def ivfClusters(s: SparkSession, dir: String): DataFrame =
    graft.observe.IndexStore.readOrBuildSegmentedGated(
      s, "ivf_clusters", Llm.embsSrc(dir),
      version = ivfArtifactVersion)(
      // repartition BEFORE the map-only route: the artifact's file
      // count is the read parallelism of every downstream cell-
      // restriction join, and a map-only write over a one-file source
      // would produce a one-file artifact (the shuffled window build
      // it replaced left 32)
      files => routeFrozen(s,
        s.read.parquet(files: _*)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("v"))
          .withColumn("nrm", sqrt(dot(col("v"), col("v")))),
        ivfCentroids(s, dir)))(
      (_, _) => {
        ivfCentroids(s, dir) // run the model's lifecycle at this state
        modelCarried(s, "ivf_centroids", Llm.embsSrc(dir), ivfArtifactVersion)
      })

  /** Random-hyperplane LSH near-dup (the SimHash construction for
    * vectors) — the second ANN bucketing flavor beside IVF (q39):
    * 8 DETERMINISTIC pseudo-random hyperplanes derived from the Knuth
    * multiplicative hash (both engines re-derive identical doubles from
    * the same integer formula, so the oracle is exact); bucket = the
    * 8-bit sign signature of the hyperplane dots, computed MAP-ONLY
    * against literal hyperplanes; candidates share a bucket (equi-join,
    * never all-pairs); exact-cosine verify at ≥ 0.4.
    *
    * Trade-off vs IVF, and why both exist: hyperplane buckets are
    * data-INDEPENDENT — no training step, no drift on append (an
    * incoming vector's bucket never changes), at the cost of buckets
    * that don't adapt to the corpus. At 100 TB the signature is a
    * projection and the join is bucket-partitioned; the PLANE COUNT is
    * derived from the corpus ([[hyperplaneCount]]), so expected bucket
    * occupancy — and with it the O(occupancy²) in-bucket verify — stays
    * bounded as the corpus grows instead of being fixed by a constant
    * chosen at fixture scale. */
  /** The [[hyperplaneCount]]-many deterministic hash-derived
    * hyperplanes (both engines re-derive identical doubles from the
    * same integer formula). */
  protected def hyperplanes(nPlanes: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { j =>
      (0 until 64).map { d =>
        val x = (j * 64 + d).toLong
        val h = ((x % 1000000007L) * 2654435761L) % 1000000007L
        (h % 2001L - 1000L).toDouble / 1000.0
      }.toSeq
    }

  /** The sign-signature bucket of `v` against literal hyperplanes —
    * map-only; the literal is O(nPlanes·64) doubles (KBs even at 10⁹
    * vectors' 20 planes), not a model-sized payload. */
  protected def hyperplaneBucket(planes: Seq[Seq[Double]], v: Column): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(typedlit(p), v) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  protected val hyperplaneArtifactVersion = 1

  /** The bucket-partitioned corpus vectors — the persisted hyperplane
    * LSH index `(bucket, vec_id, v, nrm)` shared by the in-corpus
    * near-dup pairs (q90) and the streaming [[vectorAdmission]] gate.
    *
    * The incremental rule here is the strongest of the index family,
    * and the reason this flavor earns its place beside IVF: the
    * hyperplanes are DATA-INDEPENDENT, so an existing vector's bucket
    * can never change on append — the only data-dependence is the
    * DERIVED plane count. A pure append whose before/after corpus
    * sizes derive the same [[hyperplaneCount]] signs ONLY the appended
    * vectors (map-only delta, `old ∪ delta ≡ rebuild` exactly); an
    * append that crosses a plane-count boundary declines and re-signs
    * (every bucket id changes width). No drift threshold, no
    * approximation — the freeze check is a pure-function comparison. */
  private[graft] def hyperplaneBucketsIdx(s: SparkSession, dir: String): DataFrame = {
    def signed(vecs: DataFrame, nPlanes: Int): DataFrame =
      vecs.withColumn("bucket",
        hyperplaneBucket(hyperplanes(nPlanes), col("v")))
        .select(col("bucket"), col("vec_id"), col("v"), col("nrm"))
    graft.observe.IndexStore.readOrBuildIncremental(
      s, "hyperplane_buckets", Llm.embsSrc(dir),
      version = hyperplaneArtifactVersion)(
      // parquet-metadata count — signature-sizing stat, like ivfStride
      signed(vectors(s, dir), hyperplaneCount(Llm.embs(s, dir).count())))(
      (_, added) => {
        val nTotal = Llm.embs(s, dir).count()
        val nAdded = s.read.parquet(added: _*).count()
        if (hyperplaneCount(nTotal) != hyperplaneCount(nTotal - nAdded))
          null // boundary crossed: every signature re-derives
        else signed(
          s.read.parquet(added: _*)
            .select(col("vec_id"),
              col("embedding").cast("array<double>").as("v"))
            .withColumn("nrm", sqrt(dot(col("v"), col("v")))),
          hyperplaneCount(nTotal))
      })
  }

  def hyperplaneNearDup(s: SparkSession, dir: String): DataFrame = {
    val b = hyperplaneBucketsIdx(s, dir)
    val a1 = b.select(col("bucket"), col("vec_id").as("v1"),
      col("v").as("x1"), col("nrm").as("n1"))
    val a2 = b.select(col("bucket"), col("vec_id").as("v2"),
      col("v").as("x2"), col("nrm").as("n2"))
    a1.join(a2, "bucket")
      .filter(col("v1") < col("v2"))
      .withColumn("cos", dot(col("x1"), col("x2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= 0.4)
      .select(col("v1"), col("v2"), round(col("cos"), 6).as("cos"))
      .orderBy(col("v1"), col("v2"))
  }

  /** Vector-modality admission control — the embedding twin of the
    * text gate [[nearDupAdmission]], completing the crawler story for
    * both modalities: an incoming vector (batch frame OR `readStream`
    * feed — the same plan) is bucketed MAP-ONLY against the literal
    * hyperplanes and collided with the persisted
    * [[hyperplaneBucketsIdx]] chain via a stream-static equi-join;
    * colliding candidates are exact-cosine-verified at ≥ 0.4. Unlike
    * the 12-band MinHash gate, a vector has exactly ONE bucket, so a
    * (incoming, corpus) pair can collide at most once — no dedup
    * state, no watermark, zero streaming state at all. */
  def vectorAdmission(s: SparkSession, dir: String, incoming: DataFrame,
      decision: Boolean = false): DataFrame = {
    val nPlanes = hyperplaneCount(Llm.embs(s, dir).count())
    // the decision face needs an ingest clock for its event-time
    // aggregation; the audit face is stateless and carries none
    val fed =
      if (!decision) incoming
      else {
        val f0 = if (incoming.columns.contains("arr_ts")) incoming
          else incoming.withColumn("arr_ts", current_timestamp())
        if (incoming.isStreaming) f0.withWatermark("arr_ts", "10 minutes")
        else f0
      }
    val keep = if (decision) Seq(col("arr_ts")) else Nil
    val inV = fed
      .select(Seq(col("vec_id").as("in_id"),
        col("embedding").cast("array<double>").as("iv")) ++ keep: _*)
      .withColumn("inrm", sqrt(dot(col("iv"), col("iv"))))
      .withColumn("bucket", hyperplaneBucket(hyperplanes(nPlanes), col("iv")))
    val flags = inV.join(hyperplaneBucketsIdx(s, dir), "bucket")
      .withColumn("cos", dot(col("iv"), col("v")) / (col("inrm") * col("nrm")))
      .filter(col("cos") >= 0.4)
      .select(Seq(col("in_id")) ++ keep ++ Seq(
        col("vec_id").as("corpus_id"), round(col("cos"), 6).as("cos")): _*)
    // gate observability: the E167 counters (see Multimodal's
    // containmentGate)
    if (decision)
      Multimodal.gateDecision(incoming.isStreaming, flags,
        // highest cosine wins; ties break to the smallest corpus_id
        ordering = struct((col("cos") * -1.0d).as("neg_c"),
          col("corpus_id")),
        outCols = Seq("corpus_id", "cos"))
        .observe("vector_gate_decisions", count(lit(1)).as("decisions"))
    else flags.observe("vector_gate", count(lit(1)).as("flags"))
  }

  /** Batch-backfill face of [[vectorAdmission]] (the q49 pattern for
    * the vector modality): replay every 50th corpus vector under a
    * fresh id through the SAME gate plan; every replayed copy must
    * collide with (at least) its source at cosine 1.0, and the DuckDB
    * oracle re-derives the full bucket + exact-verify pipeline. */
  def vectorAdmissionBackfill(s: SparkSession, dir: String): DataFrame = {
    val incoming = Llm.embs(s, dir).filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    vectorAdmission(s, dir, incoming)
      .orderBy(col("in_id"), col("corpus_id"))
  }

  /** q174: the vector gate's DECISION face (the E193 plane on the
    * embedding modality) — per incoming vector, its best corpus match
    * (highest cosine, ties to the smallest corpus_id); O(incoming)
    * output. */
  def vectorAdmissionDecision(s: SparkSession, dir: String): DataFrame = {
    val incoming = Llm.embs(s, dir).filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    vectorAdmission(s, dir, incoming, decision = true)
      .orderBy(col("in_id"))
  }

  /** The vector gate's audit flags as the arrival-time segmented
    * ledger (E205 — semantics at
    * [[graft.ops.Multimodal.rasterAuditLedger]]). The source axis is
    * `embeddings.parquet` — the ledger discipline is not
    * documents-specific: an embedding batch's flags excise with ITS
    * file. */
  private[graft] def vectorAuditLedger(
      s: SparkSession, dir: String): DataFrame =
    graft.observe.IndexStore.readOrBuildSegmented(
      s, "vector_gate_audit", s"$dir/embeddings.parquet", version = 1)(
      files => {
        val incoming = s.read.parquet(files: _*)
          .filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            col("embedding"))
        vectorAdmission(s, dir, incoming)
      })

  /** q180: the vector audit-ledger face. */
  def vectorAuditLedgerFace(s: SparkSession, dir: String): DataFrame =
    vectorAuditLedger(s, dir)
      .orderBy(col("in_id"), col("corpus_id"))

  /** Multi-probe LSH top-k (Lv, Josephson, Wang, Charikar & Li,
    * VLDB 2007) over the persisted [[hyperplaneBucketsIdx]] chain: a
    * query probes its OWN bucket plus the buckets reached by flipping
    * its lowest-|margin| planes — the planes whose dot product sits
    * closest to zero are exactly the signs a true neighbor is
    * likeliest to land on the other side of, so a handful of extra
    * probes buys most of the recall that more planes (= a whole
    * re-signed index) would. Probe generation is MAP-ONLY driver-free
    * math on the 10-row query side (per-plane margins against the
    * literal hyperplanes, `array_sort` picks the 2 smallest, XOR
    * flips build the 4-bucket probe set); the probe relation is
    * O(queries · probes) and broadcasts onto the index equi-join, so
    * the corpus side streams once and never shuffles — the index is
    * shared bit-for-bit with q90/q97, no rebuild, no extra artifact.
    * Verify is exact cosine on probed candidates only; top-5 per
    * query by the q31 window. LlmSpec measures recall@5 vs the
    * brute-force ground truth: 4 probes must recover strictly more
    * than the 1-probe (own-bucket) baseline on the same index. */
  def multiProbeTopK(s: SparkSession, dir: String): DataFrame =
    probeTopK(s, dir, nProbes = 4)

  /** [[multiProbeTopK]] with a probe budget: 1 = own bucket only,
    * ≤4 = own + single flips of the 2 lowest-|margin| planes + the
    * double flip (probe buckets are pairwise distinct by
    * construction, so no candidate dedup is needed). */
  private[graft] def probeTopK(s: SparkSession, dir: String,
      nProbes: Int): DataFrame = {
    val idx = hyperplaneBucketsIdx(s, dir) // (bucket, vec_id, v, nrm)
    val nPlanes = hyperplaneCount(Llm.embs(s, dir).count())
    val planes = hyperplanes(nPlanes)
    val margins = array(planes.zipWithIndex.map { case (p, j) =>
      struct(abs(dot(typedlit(p), col("qv"))).as("a"),
        lit(j).as("j"))
    }: _*)
    // (|margin|, j) lexicographic sort = deterministic tie-break on
    // the plane index, same doubles on both engines
    val q = vectors(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"))
      .withColumn("bucket", hyperplaneBucket(planes, col("qv")))
      .withColumn("fl", slice(array_sort(margins), 1, 2))
      .withColumn("b1", call_function("shiftleft", lit(1L),
        col("fl").getItem(0).getField("j")))
      .withColumn("b2", call_function("shiftleft", lit(1L),
        col("fl").getItem(1).getField("j")))
      .withColumn("probe", explode(slice(array(
        col("bucket"),
        col("bucket").bitwiseXOR(col("b1")),
        col("bucket").bitwiseXOR(col("b2")),
        col("bucket").bitwiseXOR(col("b1")).bitwiseXOR(col("b2"))),
        1, nProbes)))
      .select(col("qid"), col("qv"), col("qn"), col("probe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    idx.join(broadcast(q), idx("bucket") === q("probe"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos",
        dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank").cast("bigint").as("rank"),
        col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Hyperplane count derived from corpus size: enough planes that the
    * expected bucket occupancy stays ≤ ~1024 vectors
    * (`nPlanes = ceil(log2(n / 1024))`, floored at 8 so tiny fixtures
    * keep stable semantics). A FIXED 8 planes means 256 buckets forever
    * — expected occupancy n/256 and an O(n²/256) in-bucket verify at
    * 10⁹ vectors, the same fixture-constant class as a fixed
    * [[ivfStride]]. At 10⁹ vectors this derives 20 planes → ~1M
    * buckets → occupancy back at ~1 000. The DuckDB oracle embeds the
    * identical formula; the 1e-9 epsilon inside the `ceil` absorbs
    * cross-engine last-bit drift of `log2` at exact-power boundaries
    * (same resynchronization idea as the 6-dp centroid rounding). */
  private[graft] def hyperplaneCount(nVecs: Long): Int = {
    val buckets = math.max(1.0, nVecs.toDouble / 1024.0)
    math.max(8, math.ceil(math.log(buckets) / math.log(2.0) - 1e-9).toInt)
  }

  protected val hyperplaneCountSql: String =
    """greatest(8, CAST(ceil(log2(greatest(1.0,
      |    (SELECT count(*) FROM embeddings) / 1024.0)) - 0.000000001)
      |  AS BIGINT))""".stripMargin

  // ---- random-projection dimensionality reduction (q113) ---------------

  /** JL target dimension derived from corpus size —
    * `k = max(16, ceil(2·log2 n))`: the Johnson–Lindenstrauss bound
    * says O(log n / ε²) dimensions preserve pairwise geometry, so the
    * reduced width GROWS with the corpus instead of being a fixture
    * constant (16 at sf0.001, 18 at sf0.01, 25 at sf0.1, ~60 at 10⁹
    * vectors). The 1e-9 epsilon absorbs `log2` last-bit drift at exact
    * powers (the [[hyperplaneCount]] idiom); the oracle embeds the
    * identical formula. */
  private[graft] def projDims(nVecs: Long): Int =
    math.max(16, math.ceil(
      2.0 * math.log(math.max(1L, nVecs).toDouble) / math.log(2.0) - 1e-9).toInt)

  protected val projDimsSql: String =
    """greatest(16, CAST(ceil(2e0 * log2(greatest(1,
      |    (SELECT count(*) FROM embeddings))) - 0.000000001)
      |  AS BIGINT))""".stripMargin

  /** Deterministic ±1 projection sign for flat index `x = j·64 + d` —
    * Achlioptas-style sparse JL entries from the same integer hash
    * family as [[hyperplanes]]; both engines re-derive identical signs
    * from the formula (no RNG, no model exchange). */
  protected def projSign(x: Long): Long = {
    val h = ((x % 1000000007L) * 2654435761L) % 1000000007L
    if (h % 2 == 0) 1L else -1L
  }

  /** q113's shared core at an explicit target dimension `k`: project
    * every vector to `k` ±1-combinations held in exact integer
    * micro-units, then report, per probe query (the q31 set), how far
    * reduced-space cosine sits from exact cosine.
    *
    * Exactness design: per-dim values are rounded into 1e6-unit
    * integers FIRST (`round(x·1e6)` — exact in a double up to 2^53),
    * each projected coordinate is a ±sum of those integers (≤ 6.4e7 —
    * still exact), reduced dot/norms are BIGINT lane arithmetic
    * (≤ 64·(6.4e7)² ≈ 2.6e17 < 2^63), and the only float steps —
    * `sqrt` (IEEE-correctly-rounded in both engines) and one division
    * — run on IDENTICAL integers, then round to 6 dp. Float summation
    * order never enters either engine. */
  private[graft] def projectionError(s: SparkSession, dir: String, k: Int): DataFrame = {
    val signs: Seq[Seq[Double]] =
      (0 until k).map(j => (0 until 64).map(d => projSign(j * 64L + d).toDouble))
    val rounded = expr("transform(v, x -> round(x * 1e6))") // exact ints in doubles
    def projected(d: DataFrame): DataFrame = d
      .withColumn("rv", rounded)
      .withColumn("p", array(signs.map(sj =>
        graft.functions.GraftFx.dot(typedlit(sj), col("rv")).cast("long")): _*))
      .withColumn("rn2", expr("aggregate(p, 0L, (acc, x) -> acc + x * x)"))
      .drop("rv")
    val e = projected(vectors(s, dir))
    val q = projected(vectors(s, dir).filter(col("vec_id") < 10))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        col("p").as("qp"), col("rn2").as("qrn2"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos6", round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6))
      .withColumn("rdot", expr(
        "aggregate(zip_with(p, qp, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
      .withColumn("rcos6", round(col("rdot") /
        (sqrt(greatest(col("rn2"), lit(1L))) * sqrt(greatest(col("qrn2"), lit(1L)))), 6))
      .withColumn("err_e6",
        round(abs(col("rcos6") - col("cos6")) * lit(1e6), 0).cast("long"))
      .groupBy(col("qid"))
      .agg(
        count(lit(1)).as("n_pairs"),
        round(sum(col("err_e6")) * lit(1.0) / count(lit(1)), 0).cast("long")
          .as("mean_abs_err_e6"),
        max(col("err_e6")).as("max_abs_err_e6"))
      .orderBy(col("qid"))
  }

  /** q113: Johnson–Lindenstrauss random projection WITH its distortion
    * measured — the compression diagnostic, not a retrieval shortcut.
    * Vectors compress to [[projDims]] integer lanes (≈4× narrower at
    * fixture scale, ~8× at 10⁹ rows vs the 64-float column) and the
    * query reports per-probe mean/max |reduced cos − exact cos|.
    *
    * Honesty note, measured on the fixtures: these embeddings are
    * near-isotropic, so at k = O(log n) the JL distortion (~1/√k)
    * EXCEEDS the neighbor gaps — a reduced-space top-k shortlist
    * recalls ~0 of the exact top-5 (and only ~46% at shortlist depth
    * 100 even at k=48). That is precisely what this relation is for:
    * it puts a number on whether a k-lane sketch is safe for a given
    * corpus before anything downstream trusts it. On clustered real
    * embedding families the same report justifies shipping the narrow
    * column through shuffles and keeping full precision only for
    * verify — the LlmSpec gate asserts the JL direction (distortion
    * falls as k grows) rather than a data-dependent recall. */
  def randomProjection(s: SparkSession, dir: String): DataFrame =
    projectionError(s, dir, projDims(Llm.embs(s, dir).count()))

  // ---- incremental aggregate maintenance (q114) ------------------------

  /** Partial per-(lang, source) document statistics of a corpus slice
    * — the ALGEBRAIC form (counts and sums merge by addition), which
    * is what makes the aggregate incrementally maintainable. */
  protected def docCountsOf(d: DataFrame): DataFrame =
    d.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("pn"), sum(col("n_chars")).as("pc"))

  /** q114: incremental materialized-view maintenance — the per-(lang,
    * source) doc/char rollup lives as an IndexStore artifact of
    * PARTIAL aggregates: a pure corpus append aggregates ONLY the
    * added files into a chained delta segment, and a read merges the
    * chain with one group-sized groupBy (the algebraic-merge law the
    * engine's partial aggregation already relies on, lifted to the
    * artifact plane). This is the warehouse's hourly-rollup workload:
    * at 100 TB the view refresh touches the appended slice, never the
    * corpus — the same contract `REFRESH MATERIALIZED VIEW
    * INCREMENTALLY` sells, built from fingerprint + chain + merge. */
  def incrementalDocCounts(s: SparkSession, dir: String): DataFrame =
    // SEGMENTED: partial (count, sum) rows merge by addition, so the
    // artifact is file-decomposable under its own SUM fold — appends
    // roll up the added files, deletions excise the touched segments
    graft.observe.IndexStore.readOrBuildSegmented(
      s, "doc_counts_agg", Llm.docsSrc(dir))(
      files => docCountsOf(s.read.parquet(files: _*)))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("pn")).as("n_docs"), sum(col("pc")).as("sum_chars"))
      .orderBy(col("lang"), col("source"))

  protected def tokenSketchOf(d: DataFrame): DataFrame =
    d.select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("source"))
      .agg(hll_sketch_agg(col("token"), lit(12)).as("sk"))

  /** Incremental APPROX-distinct view (E74) — q114's partial-agg
    * discipline extended to a non-algebraic measure: per-source
    * distinct-token counts cannot be maintained as summable partials
    * (distinct doesn't sum across deltas), but an HLL sketch CAN —
    * sketch registers max-merge, so `union(sketch(A), sketch(B)) ≡
    * sketch(A ∪ B)` exactly, not approximately-equal. The chain holds
    * one Datasketches HLL binary per (source, segment) — KBs per group
    * at ANY corpus scale — a pure append sketches only the added
    * files, and a read max-merges the chain with one group-sized
    * `hll_union_agg`. This is the only way an hourly "how many
    * distinct tokens/users/URLs" dashboard avoids re-scanning 100 TB:
    * exact distinct forces a full-corpus shuffle per refresh; the
    * sketch view touches the appended slice. Estimates are
    * DuckDB-unreproducible, so the gate is LlmSpec: merged-chain
    * estimate ≡ one-shot rebuild estimate (the merge law, exact), and
    * within 5% of the exact distinct count. */
  def incrementalDistinctTokens(s: SparkSession, dir: String): DataFrame =
    // SEGMENTED: HLL registers max-merge, so union(per-file sketches)
    // folds to EXACTLY the one-shot sketch — file-decomposable under
    // the hll_union_agg fold; a takedown excises instead of
    // re-sketching the corpus
    graft.observe.IndexStore.readOrBuildSegmented(
      s, "token_hll", Llm.docsSrc(dir))(
      files => tokenSketchOf(s.read.parquet(files: _*)
        .repartition(s.sparkContext.defaultParallelism)))
      .groupBy(col("source"))
      .agg(hll_union_agg(col("sk")).as("sk"))
      .select(col("source"),
        hll_sketch_estimate(col("sk")).as("approx_tokens"))
      .orderBy(col("source"))

  /** Streaming face of the distinct-token dashboard (E74): the same
    * projection + HLL aggregation as the persisted view, as ONE plan
    * that runs on a batch frame or a `readStream` feed (complete-mode
    * aggregation — state is the per-source sketch registers, KBs per
    * group at any scale, updated by the same max-merge law the chain
    * read uses). StreamingSpec proves the streamed estimates equal the
    * batch estimates after any micro-batch split. */
  def distinctTokensOf(feed: DataFrame): DataFrame =
    feed.select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("source"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("token"), lit(12)))
        .as("approx_tokens"))

  /** Per-dimension |x| maxima of the embedding corpus — the int8
    * scalar-quantization (SQ8) scale model, persisted via
    * [[graft.observe.IndexStore]]. One mergeable
    * [[graft.functions.VectorAgg.vectorMaxAbs]] pass (dim-length
    * buffers through the shuffle, no 64× explosion); the artifact is a
    * SINGLE dim-length row — model-sized at any corpus scale.
    *
    * Incremental rule (the quantizer-freeze analog of
    * [[ivfCentroids]], but EXACT instead of drift-thresholded): on a
    * pure append the scales stay valid iff no appended vector exceeds
    * the stored per-dim maxima — checked with one map-only aggregation
    * over only the APPENDED files. Within bounds the chain serves the
    * frozen model (empty delta) and every existing code stays valid; a
    * new maximum would change every vector's scale, so it declines the
    * delta and rebuilds. max is order-independent, so the frozen check
    * is exact, not approximate. */
  private[graft] def sq8Scales(s: SparkSession, dir: String): DataFrame = {
    val vmax = udaf(graft.functions.VectorAgg.vectorMaxAbs,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
    // deletion lifecycle: frozen scales stay EXACTLY valid under any
    // deletion (a per-dim max can only shrink — survivors' codes are
    // untouched), so a sub-drift takedown carries the model and the
    // code chain excises; the uniform drift bound still forces a
    // retrain on mass deletions, reclaiming quantization RESOLUTION
    // (a loose max wastes code range) rather than correctness
    graft.observe.IndexStore.carryOnDelete(
      s, "sq8_scales", Llm.embsSrc(dir), sq8ArtifactVersion)(
      modelCarryAccept(s, Llm.embsSrc(dir)))
    graft.observe.IndexStore.readOrBuildIncremental(
      s, "sq8_scales", Llm.embsSrc(dir), version = sq8ArtifactVersion)(
      vectors(s, dir).agg(vmax(col("v")).as("m")))(
      (prev, added) => {
        val sess = s
        import sess.implicits._
        val addedMax = s.read.parquet(added: _*)
          .select(col("embedding").cast("array<double>").as("v"))
          .agg(vmax(col("v")).as("m")).as[Seq[Double]].head()
        val prevMax = prev.select(col("m")).as[Seq[Double]].head()
        if (addedMax.length != prevMax.length ||
          addedMax.zip(prevMax).exists { case (a, p) => a > p }) null
        else prev.limit(0) // frozen: the chain serves the old model
      })
  }

  /** Quantize a (vec_id, v) frame against the scale model: map-only
    * `zip_with` projection, `q_d = round(x_d · 127 / m_d) ∈ [-127,127]`
    * stored as `array<tinyint>` — 8× smaller than the float64 working
    * form (the memory story that lets a 100 TB ANN corpus fit hot).
    * The model rides as a broadcast single-row relation (cf.
    * [[vectorRouting]]), never a plan literal. */
  protected def sq8Quantize(vecs: DataFrame, scales: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(scales))
      .withColumn("qv", zip_with(col("v"), col("m"),
        (x, m) => when(m === 0d, lit(0d))
          .otherwise(round(x * lit(127d) / m, 0)))
        .cast("array<tinyint>"))
      .select(col("vec_id"), col("qv"))

  /** The quantized-code table, persisted beside the scales with the
    * same two-artifact consistency dance as
    * [[ivfCentroids]]/[[ivfClusters]] — SEGMENTED + model-gated
    * (E157): per-vector quantization against frozen scales is
    * independent row math, so `union of per-file codes ≡ full
    * rebuild` exactly — a sub-drift append quantizes ONLY the
    * appended vectors into a chained delta, and a sub-drift TAKEDOWN
    * excises only the touched segments (the scales carry frozen via
    * `carryOnDelete`). The gate declines whenever the scales did NOT
    * freeze at this source transition (a new per-dim maximum on
    * append, a drift-sized deletion): quantizing against rebuilt
    * scales would chain codes from two different quantizers onto one
    * artifact, so the decline cascades into a full re-encode. */
  private[graft] def sq8Vectors(s: SparkSession, dir: String): DataFrame =
    graft.observe.IndexStore.readOrBuildSegmentedGated(
      s, "sq8_vectors", Llm.embsSrc(dir), version = sq8ArtifactVersion)(
      files => sq8Quantize(
        s.read.parquet(files: _*)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("v")),
        sq8Scales(s, dir)))(
      (_, _) => {
        sq8Scales(s, dir) // run the model's lifecycle at this state
        modelCarried(s, "sq8_scales", Llm.embsSrc(dir), sq8ArtifactVersion)
      })

  /** Quantize an incoming vector feed into SQ8 codes online — batch
    * frame or `readStream`, the SAME plan: [[sq8Quantize]] is already
    * a pure projection against the broadcast scale model
    * (stream-static-safe), so unlike IVF/PQ no separate fold
    * formulation is needed; this face just resolves the persisted
    * scales and adapts the feed schema. Completes the online-encode
    * story for all three vector-index flavors. */
  def sq8Routing(s: SparkSession, dir: String, incoming: DataFrame): DataFrame =
    sq8Quantize(
      incoming.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")),
      sq8Scales(s, dir))

  /** SQ8 approximate top-k (X3 compressed path): rank by cosine over
    * the int8 codes read from the persisted [[sq8Vectors]] artifact.
    * Code dot products and self-norms are sums of ≤ 127² integer
    * terms — exactly representable in doubles — so both engines derive
    * bit-identical ranking keys from the same codes and the oracle is
    * EXACT (no float-summation drift class at all, unlike the float
    * paths that need 6-dp re-rounding). Same broadcast-queries shape as
    * the brute-force baseline (q31): the big side streams once, never
    * shuffles; LlmSpec gates recall of the code ranking against the
    * float ranking. */
  def quantizedTopk(s: SparkSession, dir: String): DataFrame = {
    val qz = sq8Vectors(s, dir)
      .withColumn("qd", col("qv").cast("array<double>"))
      .withColumn("qn", sqrt(dot(col("qd"), col("qd"))))
    val q = qz.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("qd").as("qq"), col("qn").as("qqn"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("qcos").desc, col("vec_id"))
    qz.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("idot", dot(col("qd"), col("qq")).cast("bigint"))
      .withColumn("qcos",
        col("idot").cast("double") / (col("qn") * col("qqn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank").cast("bigint").as("rank"),
        col("vec_id"), col("idot"), round(col("qcos"), 6).as("qcos"))
      .orderBy(col("qid"), col("rank"))
  }

  // ---- Product quantization (PQ-ADC compressed ANN) ----

  /** PQ structure constants — like the 24-hash/12-band MinHash shape,
    * these define the CODE FORMAT (how many subspaces a 64-dim vector
    * splits into and how many entries each sub-codebook holds), not a
    * fixture-tuned scale threshold: 8 subspaces × 8 dims, 16 entries
    * per sub-codebook ⇒ a vector compresses to 8 four-bit codes. The
    * Lloyd budget is the training analog of [[kmeansMaxIters]] — the
    * oracle unrolls exactly this many update steps. */
  private[graft] val pqNsub = 8
  private[graft] val pqDsub = 8
  private[graft] val pqKsub = 16
  private[graft] val pqIters = 4

  /** Explode (vec_id, v) into per-subspace rows (vec_id, j, x) —
    * map-only. */
  protected def pqSubvectors(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      explode(sequence(lit(0), lit(pqNsub - 1))).as("j"), col("v"))
      .withColumn("x", expr(s"slice(v, j * $pqDsub + 1, $pqDsub)"))
      .select(col("vec_id"), col("j"), col("x"))

  /** Squared L2 distance via dot products, written in the exact
    * operation order the oracle uses (`a − 2b + c` left to right) so
    * both engines derive bit-identical doubles. */
  protected def l2sq(x: Column, c: Column): Column =
    dot(x, x) - lit(2d) * dot(x, c) + dot(c, c)

  /** Nearest sub-codebook entry per (vec_id, j): broadcast the (tiny)
    * codebook, argmin by `min(struct(dist, cid))` — the lexicographic
    * struct minimum IS the (dist asc, cid asc) tie-break, computed as
    * one partial-aggregable `min`, no window sort. Carries `x` through
    * for the training update (identical within a group). */
  protected def pqAssign(sv: DataFrame, cb: DataFrame): DataFrame =
    sv.join(broadcast(cb), "j")
      .withColumn("d", l2sq(col("x"), col("c")))
      .groupBy(col("vec_id"), col("j"))
      .agg(min(struct(col("d"), col("cid"))).as("m"),
        first(col("x")).as("x"))
      .select(col("vec_id"), col("j"), col("m.cid").as("code"), col("x"))

  protected def pqCbFrame(
      s: SparkSession, cb: Seq[(Int, Long, Seq[Double])]): DataFrame = {
    val sess = s
    import sess.implicits._
    cb.toDF("j", "cid", "c")
  }

  /** Train the 8 sub-codebooks with [[pqIters]] Lloyd steps over L2 —
    * the same driver-loop shape as [[computeIvfCentroids]]: only the
    * O(nsub·ksub·dsub) model is collected per round, each round's
    * means rounded to 6 dp so the model is engine-portable and
    * summation-order drift re-synchronizes before it can compound.
    * Init = the subvectors of every (n/ksub)-th vector — corpus-
    * derived, exactly ksub seeds per subspace. Empty clusters drop on
    * both engines identically (the update aggregates members only). */
  protected def computePqCodebooks(
      s: SparkSession, dir: String): Seq[(Int, Long, Seq[Double])] =
    computePqCodebooksOf(s,
      pqSubvectors(vectors(s, dir).select(col("vec_id"), col("v")))
        .localCheckpoint(),
      Llm.embs(s, dir).count()) // parquet-metadata count

  /** The trainer body over an ARBITRARY (vec_id, j, x) subvector frame
    * (already checkpointed) — shared by the raw-vector codebooks
    * ([[pqCodebooks]]) and the residual codebooks ([[rpqCodebooks]]);
    * `n` is the vector count the init stride derives from. */
  protected def computePqCodebooksOf(s: SparkSession, sv: DataFrame,
      n: Long): Seq[(Int, Long, Seq[Double])] = {
    val sess = s
    import sess.implicits._
    val vsum = udaf(graft.functions.VectorAgg.vectorSum,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
    val stride = math.max(1L, n / pqKsub)
    var cb: Seq[(Int, Long, Seq[Double])] = sv
      .filter(col("vec_id") % stride === 0 &&
        col("vec_id") < stride * pqKsub)
      .select(col("j"), (col("vec_id") / stride).cast("long").as("cid"),
        col("x"))
      .as[(Int, Long, Seq[Double])].collect().sortBy(t => (t._1, t._2)).toSeq
    for (_ <- 0 until pqIters) {
      cb = pqAssign(sv, pqCbFrame(s, cb))
        .select(col("j"), col("code").as("cid"), col("x"))
        .groupBy(col("j"), col("cid"))
        .agg(count(lit(1)).as("nm"), vsum(col("x")).as("sx"))
        .select(col("j"), col("cid"),
          expr("transform(sx, t -> round(t / nm, 6))").as("c"))
        .as[(Int, Long, Seq[Double])].collect().sortBy(t => (t._1, t._2)).toSeq
    }
    cb
  }

  /** The trained sub-codebooks, persisted as the `pq_codebooks`
    * artifact with the same freeze/drift incremental rule as
    * [[ivfCentroids]]: a small pure append freezes the codebooks
    * (codes are data-independent given the model), a drift-sized one
    * declines and retrains; a sub-drift TAKEDOWN carries the frozen
    * model (`carryOnDelete`), letting the code chain excise. */
  private[graft] def pqCodebooks(s: SparkSession, dir: String): DataFrame = {
    graft.observe.IndexStore.carryOnDelete(
      s, "pq_codebooks", Llm.embsSrc(dir), pqArtifactVersion)(
      modelCarryAccept(s, Llm.embsSrc(dir)))
    graft.observe.IndexStore.readOrBuildIncremental(
      s, "pq_codebooks", Llm.embsSrc(dir), version = pqArtifactVersion)(
      pqCbFrame(s, computePqCodebooks(s, dir)))(
      (prev, added) => {
        val nAdded = s.read.parquet(added: _*).count()
        val nTotal = Llm.embs(s, dir).count()
        if (ivfDriftRetrain(nTotal - nAdded, nAdded)) null // retrain
        else prev.limit(0) // frozen: the chain serves the old model
      })
  }

  /** Collect a codebook frame into the broadcastable model:
    * O(nsub·ksub·dsub) doubles, sorted (j, cid) so fold order — and
    * with it the tie-break — is deterministic. */
  protected def collectPqModel(
      s: SparkSession, cb: DataFrame): Seq[(Int, Long, Seq[Double])] = {
    val sess = s
    import sess.implicits._
    cb.select(col("j"), col("cid"), col("c"))
      .as[(Int, Long, Seq[Double])].collect().sortBy(t => (t._1, t._2)).toSeq
  }

  /** MAP-ONLY encode of a (vec_id, v) frame against a collected
    * codebook model: explode+fold-argmin with the model as a broadcast
    * single-row relation — ZERO shuffle, and nothing floats through
    * any exchange (encoding never needs the subvectors past the
    * projection; [[pqAssign]]'s groupBy-min formulation would ship the
    * full float corpus through its aggregation exchange just to drop
    * it, so that shape is reserved for TRAINING, which aggregates the
    * members anyway). The fold visits entries in ascending cid order
    * with strict-less replacement — tie-break-identical to the batch
    * `min(struct(d, cid))` (LlmSpec). Window/state-free, so the same
    * plan runs under `readStream`. */
  protected def pqEncodeWith(s: SparkSession, vecs: DataFrame,
      cbModel: Seq[(Int, Long, Seq[Double])]): DataFrame = {
    val sess = s
    import sess.implicits._
    val model = Seq(Tuple1(cbModel)).toDF("cbs")
    pqSubvectors(vecs)
      .crossJoin(broadcast(model))
      .withColumn("best", aggregate(
        expr("filter(cbs, e -> e._1 = j)"),
        struct(lit(-1L).as("cid"), lit(Double.MaxValue).as("d")),
        (acc, e) => {
          val d = l2sq(col("x"), e.getField("_3"))
          when(d < acc.getField("d"),
            struct(e.getField("_2").as("cid"), d.as("d"))).otherwise(acc)
        }))
      .select(col("vec_id"), col("j").cast("tinyint").as("j"),
        col("best.cid").cast("tinyint").as("code"))
  }

  /** The PQ code table (vec_id, j, code) — 8 four-bit codes per
    * vector, stored as tinyints: the 64× compression that keeps a
    * 100 TB ANN corpus's codes in memory. Every lifecycle path encodes
    * via the shuffle-free [[pqEncodeWith]]. SEGMENTED + model-gated
    * (E157, the [[sq8Vectors]] discipline): per-vector encoding
    * against frozen codebooks is independent, so a sub-drift append
    * encodes only the appended vectors and a sub-drift takedown
    * EXCISES only the touched segments (the codebooks carry frozen);
    * a codebook retrain — drift-sized append or deletion — declines
    * the gate and cascades into a full re-encode. */
  private[graft] def pqCodes(s: SparkSession, dir: String): DataFrame =
    graft.observe.IndexStore.readOrBuildSegmentedGated(
      s, "pq_codes", Llm.embsSrc(dir), version = pqArtifactVersion)(
      files => pqEncodeWith(s,
        s.read.parquet(files: _*)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("v")),
        collectPqModel(s, pqCodebooks(s, dir))))(
      (_, _) => {
        pqCodebooks(s, dir) // run the model's lifecycle at this state
        modelCarried(s, "pq_codebooks", Llm.embsSrc(dir), pqArtifactVersion)
      })

  /** PQ-ADC top-k (X3 compressed scale path): per query, precompute a
    * lookup table of micro-unit INTEGER distances from each query
    * subvector to every sub-codebook entry (nsub × ksub = 128 values
    * per query — broadcast-sized), then score every corpus vector by
    * summing 8 table lookups joined on (j, code). The corpus side
    * never touches float vectors — the scan reads 8 tinyints per
    * vector, the LUT join is a broadcast hash join, and the per-
    * (query, vector) sum is a partial aggregation; this is exactly how
    * ADC scans run over in-memory codes at 10⁹-vector scale. Distances
    * round to integer micro-units BEFORE the sum, so the total is an
    * exact integer on both engines (no summation-order drift class).
    * LlmSpec gates recall vs the float brute force. */
  def pqTopk(s: SparkSession, dir: String): DataFrame = {
    val cb = pqCodebooks(s, dir)
    val q = pqSubvectors(
      vectors(s, dir).filter(col("vec_id") < 10)
        .select(col("vec_id"), col("v")))
      .select(col("vec_id").as("qid"), col("j"), col("x"))
    val lut = q.join(cb, "j")
      .withColumn("idist",
        round(l2sq(col("x"), col("c")) * lit(1e6), 0).cast("bigint"))
      .select(col("qid"), col("j"), col("cid").as("code"), col("idist"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("idist"), col("vec_id"))
    pqCodes(s, dir)
      .join(broadcast(lut), Seq("j", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("idist")).as("idist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank").cast("bigint").as("rank"),
        col("vec_id"), col("idist"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Final k and candidate width of the rerank refine (the IVF-PQ +
    * rerank recipe — Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011 §V-C reranks a short list of
    * compressed candidates with exact distances). k′ is the recall
    * knob and is calibrated on the MEASURED curve for this code
    * format (8 subspaces × 16 entries = 32-bit codes) over the
    * fixture's random-gaussian vectors — PQ's worst case, no cluster
    * structure to exploit: recall@10 of the exact top-10 inside the
    * ADC top-k′ was 0.52 at k′=40, 0.76 at 100, 0.92 at 200, 0.96 at
    * 256 (sf0.01; sf0.001 runs a few points higher). Literature-
    * standard k′ ≈ 4k assumes clusterable real-embedding corpora;
    * hitting ≥0.9 on adversarial data costs k′ = 256. The constant is
    * ABSOLUTE: at 10⁹ vectors the exact leg still reads only 256
    * floats per query — a ~4·10⁶× cut — while the fixed-size ADC scan
    * does the corpus-scale work. */
  private[graft] val pqRerankK = 10
  private[graft] val pqRerankCand = 256

  /** q144: PQ-ADC + EXACT-RERANK top-k — the refine step that lifts
    * compressed-ANN recall from the ADC scan's ~0.6 to ≳0.9 without
    * giving up the compressed scan: stage 1 runs the q96 ADC scan
    * (corpus side reads 8 tinyints per vector from the persisted
    * [[pqCodes]] artifact) but keeps the top-k′ = [[pqRerankCand]]
    * CANDIDATES per query; stage 2 re-scores ONLY those candidates
    * with exact float L2 against the raw vectors and re-ranks to the
    * final k.
    *
    * Scale shape: the candidate relation is (queries × k′) rows of
    * two ids — broadcast-sized at ANY corpus scale — so the exact leg
    * is one broadcast-hash semi-probe of the float table (the scan
    * streams once, columnar-pruned to (vec_id, v); only k′ rows per
    * query survive into the window), never a second O(corpus × query)
    * float pass. The ADC leg ranks on exact integer micro-unit sums
    * (the q96 discipline); the refine ranks on the raw L2 double
    * computed `a − 2b + c` left to right — bit-identical across
    * engines by the q31 fold-order discipline, rounded to 6 dp only
    * at output. */
  def pqRerankTopk(s: SparkSession, dir: String): DataFrame = {
    val cb = pqCodebooks(s, dir)
    // one 10-row query frame shared by the LUT build and the refine —
    // checkpointed so the pruned query scan runs once structurally
    val qvec = vectors(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id"), col("v"))
      .localCheckpoint()
    val q = pqSubvectors(qvec)
      .select(col("vec_id").as("qid"), col("j"), col("x"))
    val lut = q.join(cb, "j")
      .withColumn("idist",
        round(l2sq(col("x"), col("c")) * lit(1e6), 0).cast("bigint"))
      .select(col("qid"), col("j"), col("cid").as("code"), col("idist"))
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("idist"), col("vec_id"))
    val cand = pqCodes(s, dir)
      .join(broadcast(lut), Seq("j", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("idist")).as("idist"))
      .withColumn("crank", row_number().over(wAdc))
      .filter(col("crank") <= pqRerankCand)
      .select(col("qid"), col("vec_id"))
    val qv = qvec.select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("d2"), col("vec_id"))
    vectors(s, dir).select(col("vec_id"), col("v"))
      .join(broadcast(cand), "vec_id")
      .join(broadcast(qv), "qid")
      .withColumn("d2", l2sq(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= pqRerankK)
      .select(col("qid"), col("rank").cast("bigint").as("rank"),
        col("vec_id"), round(col("d2"), 6).as("d2"))
      .orderBy(col("qid"), col("rank"))
  }

  /** ADC-candidate width of the IVF-ADC refine: the probed cells
    * already restrict the pool to ~nprobe/nlist of the corpus, so the
    * rerank list can be narrower than [[pqRerankCand]]'s full-scan
    * 256 — the recall knob here is nprobe × k′ jointly. */
  private[graft] val ivfAdcCand = 64

  /** q145: the COMPOSED compressed-ANN serve path — IVF-ADC + exact
    * rerank, the full FAISS `IVFx,PQy` recipe (Jégou 2011 §V): the
    * coarse quantizer routes each query to its [[ivfNprobe]] nearest
    * centroids; ONLY vectors assigned to those clusters are
    * ADC-scored from their 8-tinyint PQ codes; the top-[[ivfAdcCand]]
    * survivors get the q144 exact-float refine. Per query the engine
    * touches nprobe/nlist of the code table and [[ivfAdcCand]] float
    * vectors — the shape that serves 10⁹-vector corpora from RAM.
    *
    * Composition notes: all three model artifacts are persisted
    * IndexStore chains (`ivf_centroids`, `ivf_clusters`, `pq_codes` —
    * each with its own freeze/drift incremental rule); routing uses
    * the quantizer's cosine geometry while ADC/refine score L2,
    * exactly the pieces' native metrics. The cell restriction is an
    * equi-join of the code table against the assignment artifact — at
    * 100 TB the codes are STORED cid-partitioned and the broadcast
    * probe set prunes partitions instead; the join stands in for that
    * layout. Integer ADC sums and fold-order-exact refine doubles
    * keep the oracle exact (the q96/q144 discipline). */
  def ivfAdcTopk(s: SparkSession, dir: String): DataFrame =
    adcRefine(s, dir, ivfAdcRanked(s, dir, probeBoost = 1)
      .filter(col("crank") <= ivfAdcCand).select(col("qid"), col("vec_id")))

  /** Probe-budget multiplier of the MULTI-PROBE composed serve (q150):
    * probes stay ranked by coarse-centroid distance (the q145 routing)
    * and the budget grows to boost × the base nprobe, capped at nlist
    * — the recall knob a production IVFADC deployment turns. 3× lifts
    * the probed corpus fraction from ~1/16 to ~3/16. */
  private[graft] val ivfMultiProbeBoost = 3

  /** q150: [[ivfAdcTopk]] at the [[ivfMultiProbeBoost]]ed probe
    * budget — same three persisted artifacts, same ADC + exact-refine
    * legs, ONLY the probe set widens (still O(queries·nprobe) and
    * broadcast-sized at any corpus scale). LlmSpec pins the recall
    * curve on the clustered fixture: boosted recall@10 ≥ 0.8 and
    * strictly above the single-budget path. */
  def ivfAdcMultiprobeTopk(s: SparkSession, dir: String): DataFrame =
    adcRefine(s, dir, ivfAdcRanked(s, dir, probeBoost = ivfMultiProbeBoost)
      // the refine budget scales WITH the probe budget (the FAISS
      // nprobe/k' discipline): at a fixed 64-candidate cut the extra
      // cells' ADC impostors crowd out true neighbors and the wider
      // probe can measurably LOSE recall (observed 0.93 → 0.92 on the
      // straddling fixture) — still O(1) float rows per query
      .filter(col("crank") <= ivfAdcCand * ivfMultiProbeBoost)
      .select(col("qid"), col("vec_id")))

  /** Ambiguity margin of the ADAPTIVE probe budget (integer
    * micro-cosine): a centroid within this much of the query's best
    * coarse similarity sits on a decision boundary the assignment
    * could plausibly have crossed — worth a probe. Centroids beyond it
    * are confidently foreign; q150's fixed 3× budget probes them
    * anyway and buys nothing (measured on the straddling fixture:
    * recall holds at the fixed path's value while the mean probe count
    * drops below it). The width is TUNED TO that fixture's boundary
    * structure: a corpus whose true neighbors sit in cells farther
    * than the margin from the query's best centroid would lose them
    * at the probe stage — pick the margin from a recall audit (q153)
    * on the target corpus, exactly like nprobe itself. */
  private[graft] val ivfAdaptiveMarginMicro = 350000L

  /** Per-query ADAPTIVE probe set (qid, cid): every query gets the
    * base nprobe; EXTRA probes — up to q150's 3× cap — go only to
    * centroids whose coarse similarity sits within
    * [[ivfAdaptiveMarginMicro]] of the query's best (the low-|margin|
    * planes where the true neighbor may live across the boundary).
    * Similarities round to integer micro units BEFORE ranking and the
    * margin test, so both engines pick byte-identical probe sets.
    * O(queries × nlist) scored rows — model-sized at any corpus
    * scale; checkpointed once for its two consumers (best, rank). */
  private[graft] def ivfAdaptiveProbes(
      s: SparkSession, dir: String): DataFrame = {
    val c = ivfCentroids(s, dir)
    val nlist = c.count()
    val base = ivfNprobe(nlist)
    val cap = math.min(nlist, base * ivfMultiProbeBoost)
    val q = vectors(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"))
    val wp = Window.partitionBy(col("qid"))
      .orderBy(col("ipcos").desc, col("cid"))
    val scored = q.crossJoin(broadcast(c))
      .withColumn("ipcos",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn"))
          * lit(1e6), 0).cast("bigint"))
      .select(col("qid"), col("cid"), col("ipcos"))
      .localCheckpoint()
    val best = scored.groupBy(col("qid")).agg(max(col("ipcos")).as("best"))
    scored
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= cap)
      .join(broadcast(best), "qid")
      .filter(col("rn") <= base ||
        col("best") - col("ipcos") <= ivfAdaptiveMarginMicro)
      .select(col("qid"), col("cid"))
  }

  /** q158: the composed serve under the ADAPTIVE probe budget — the
    * knob q150 turns uniformly, turned per query by the margin
    * structure the routing stage already computes: queries whose
    * coarse assignment is unambiguous keep the cheap base budget,
    * queries near a centroid decision boundary widen toward q150's
    * cap. The refine keeps q150's candidate width (the operating
    * point's recall target): the adaptive probe set is BY CONSTRUCTION
    * a subset of the fixed 3× set (base ranks plus margin-qualified
    * ranks ≤ cap), so under an unchanged cut every candidate's ADC
    * rank can only IMPROVE in the smaller pool — the subset argument
    * guarantees a saved probe cannot cost recall AT THE CUT STAGE
    * (the failure mode a narrower per-query cut measurably hit: one
    * query lost 2 neighbors at the cut, not at the probe). It is NOT
    * a whole-path invariant: a true neighbor living in a
    * margin-pruned cell is lost at the PROBE stage outright, so
    * "adaptive recall ≥ fixed recall" is an empirical property of the
    * margin width vs the data's boundary structure
    * ([[ivfAdaptiveMarginMicro]] is tuned on the straddling fixture),
    * not a theorem. Same three persisted artifacts, same ADC +
    * exact-refine legs; the probe set stays O(queries × nprobe) and
    * broadcast-sized. LlmSpec pins the measured trade on the
    * straddling fixture — recall equal to the fixed 3× path at a
    * strictly lower mean probe count — as a fixture-pinned result,
    * not a data-independent guarantee. */
  def ivfAdcAdaptiveTopk(s: SparkSession, dir: String): DataFrame = {
    val probes = ivfAdaptiveProbes(s, dir)
    val cb = pqCodebooks(s, dir)
    val qvec = vectors(s, dir).filter(col("vec_id") < 10)
      .localCheckpoint()
    val lut = pqSubvectors(qvec.select(col("vec_id"), col("v")))
      .select(col("vec_id").as("qid"), col("j"), col("x"))
      .join(cb, "j")
      .withColumn("idist",
        round(l2sq(col("x"), col("c")) * lit(1e6), 0).cast("bigint"))
      .select(col("qid"), col("j"), col("cid").as("code"), col("idist"))
    val codesByCell = pqCodes(s, dir)
      .join(ivfClusters(s, dir).select(col("vec_id"), col("cid")),
        "vec_id")
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("idist"), col("vec_id"))
    val cand = broadcast(probes).join(codesByCell, "cid")
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(lut), Seq("qid", "j", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("idist")).as("idist"))
      .withColumn("crank", row_number().over(wAdc))
      .filter(col("crank") <= ivfAdcCand * ivfMultiProbeBoost)
      .select(col("qid"), col("vec_id"))
    adcRefine(s, dir, cand)
  }

  /** The ADC candidate stage of the composed serve, probe budget =
    * min(nlist, boost · base): (qid, vec_id, idist, crank) for every
    * vector in the query's probed cells, ADC-ranked. Exposed
    * private[graft] so the recall specs can grade the ADC ordering
    * ITSELF (pre-refine) — the leg where plain vs residual codes
    * differ. */
  private[graft] def ivfAdcRanked(
      s: SparkSession, dir: String, probeBoost: Int): DataFrame = {
    val c = ivfCentroids(s, dir)
    val clustered = ivfClusters(s, dir)
    val nlist = c.count() // model-sized count: O(nlist) rows
    val nprobe = math.min(nlist, ivfNprobe(nlist) * probeBoost)
    val cb = pqCodebooks(s, dir)
    val qvec = vectors(s, dir).filter(col("vec_id") < 10)
      .localCheckpoint() // 10 rows — shared by probe and LUT
    val q = qvec.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nrm").as("qn"))
    val wp = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(c))
      .withColumn("pcos",
        dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("cid"))
    val lut = pqSubvectors(qvec.select(col("vec_id"), col("v")))
      .select(col("vec_id").as("qid"), col("j"), col("x"))
      .join(cb, "j")
      .withColumn("idist",
        round(l2sq(col("x"), col("c")) * lit(1e6), 0).cast("bigint"))
      .select(col("qid"), col("j"), col("cid").as("code"), col("idist"))
    // the cid-partitioned code layout: codes pick up their cluster id
    // from the assignment artifact, then the broadcast probe set keeps
    // only probed cells — the ADC scan never leaves those clusters
    val codesByCell = pqCodes(s, dir)
      .join(clustered.select(col("vec_id"), col("cid")), "vec_id")
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("idist"), col("vec_id"))
    broadcast(probes).join(codesByCell, "cid")
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(lut), Seq("qid", "j", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("idist")).as("idist"))
      .withColumn("crank", row_number().over(wAdc))
  }

  /** Shared exact-L2 refine of the composed serves (q145/q147/q150):
    * the broadcast candidate set fetches its raw float vectors and
    * reranks per query — [[pqRerankK]] results, fold-order-exact
    * doubles (the q144 discipline). */
  protected def adcRefine(
      s: SparkSession, dir: String, cand: DataFrame): DataFrame = {
    val qref = vectors(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val wk = Window.partitionBy(col("qid"))
      .orderBy(col("d2"), col("vec_id"))
    vectors(s, dir).select(col("vec_id"), col("v"))
      .join(broadcast(cand), "vec_id")
      .join(broadcast(qref), "qid")
      .withColumn("d2", l2sq(col("v"), col("qv")))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= pqRerankK)
      .select(col("qid"), col("rank").cast("bigint").as("rank"),
        col("vec_id"), round(col("d2"), 6).as("d2"))
      .orderBy(col("qid"), col("rank"))
  }

  // ---- Residual product quantization (true FAISS IVFADC) ----------

  /** Per-vector RESIDUAL against its assigned coarse centroid,
    * r = v − c(v) — what production IVFADC actually encodes (Jégou
    * 2011 §III-C): residuals concentrate around the origin once the
    * coarse quantizer has absorbed the between-cluster variance, so a
    * 32-bit code spends its precision on the within-cluster geometry
    * instead of re-describing the cluster location. Exact-FP on both
    * engines: `v` is the raw double cast, `cv` the 6-dp-rounded model,
    * and the element-wise subtraction has no summation order. */
  protected def residualVectors(s: SparkSession, dir: String): DataFrame =
    ivfClusters(s, dir)
      .join(ivfCentroids(s, dir).select(col("cid"), col("cv")), "cid")
      .select(col("vec_id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))

  private[graft] val rpqArtifactVersion = 1

  /** Residual sub-codebooks, persisted as `rpq_codebooks` — the
    * THREE-artifact consistency dance: residuals are defined BY the
    * coarse quantizer, so a pure append freezes these codebooks only
    * while the quantizer itself froze (its chain check), and a
    * quantizer retrain (drift) cascades into a codebook retrain. */
  private[graft] def rpqCodebooks(s: SparkSession, dir: String): DataFrame = {
    // deletion lifecycle: the freeze is valid only while the COARSE
    // quantizer itself carried across the deletion (residuals are
    // defined by it) — the three-artifact cascade, delete edition
    graft.observe.IndexStore.carryOnDelete(
      s, "rpq_codebooks", Llm.embsSrc(dir), rpqArtifactVersion)(
      (deleted, added) => modelCarryAccept(s, Llm.embsSrc(dir))(
        deleted, added) && {
        ivfCentroids(s, dir) // run the quantizer's lifecycle first
        modelCarried(s, "ivf_centroids", Llm.embsSrc(dir), ivfArtifactVersion)
      })
    graft.observe.IndexStore.readOrBuildIncremental(
      s, "rpq_codebooks", Llm.embsSrc(dir), version = rpqArtifactVersion)(
      pqCbFrame(s, computePqCodebooksOf(s,
        pqSubvectors(residualVectors(s, dir)).localCheckpoint(),
        Llm.embs(s, dir).count())))(
      (prev, added) => {
        val nAdded = s.read.parquet(added: _*).count()
        val nTotal = Llm.embs(s, dir).count()
        ivfCentroids(s, dir) // resolve/freeze the quantizer at this fp
        if (ivfDriftRetrain(nTotal - nAdded, nAdded)) null // retrain
        else if (!graft.observe.IndexStore.isChained(
            s, "ivf_centroids", Llm.embsSrc(dir), ivfArtifactVersion))
          null // quantizer retrained → residual space moved
        else prev.limit(0) // frozen: the chain serves the old model
      })
  }

  /** Residual PQ code table (vec_id, j, code) — SEGMENTED +
    * model-gated (E157): a vector's residual code depends only on the
    * vector, its (delete-aware) cluster assignment, and the frozen
    * residual codebooks, so per-file encoding decomposes exactly. A
    * sub-drift append encodes only the appended vectors' residuals; a
    * sub-drift takedown EXCISES only the touched segments (the whole
    * model cascade — coarse quantizer, assignments, residual
    * codebooks — carries frozen/excised at the same source state by
    * their own lifecycles); any upstream retrain declines the gate
    * and cascades into a full re-encode. */
  private[graft] def rpqCodes(s: SparkSession, dir: String): DataFrame =
    graft.observe.IndexStore.readOrBuildSegmentedGated(
      s, "rpq_codes", Llm.embsSrc(dir), version = rpqArtifactVersion)(
      files => pqEncodeWith(s,
        s.read.parquet(files: _*)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("va"))
          .join(ivfClusters(s, dir).select(col("vec_id"), col("cid")),
            "vec_id")
          .join(ivfCentroids(s, dir).select(col("cid"), col("cv")),
            "cid")
          .select(col("vec_id"),
            zip_with(col("va"), col("cv"), (a, b) => a - b).as("v")),
        collectPqModel(s, rpqCodebooks(s, dir))))(
      (_, _) => {
        rpqCodebooks(s, dir) // run the model cascade at this state
        modelCarried(s, "rpq_codebooks", Llm.embsSrc(dir), rpqArtifactVersion)
      })

  /** q147: RESIDUAL IVF-ADC + exact rerank — the production IVFADC
    * recipe in full (vs q145's plain-code composition): the query's
    * residual DIFFERS per probed cluster, so the distance LUT is
    * built per (query, probed cluster) — still
    * O(queries·nprobe·nsub·ksub) integers, broadcast-sized at any
    * corpus scale — and cell members are scored by their residual
    * codes joined on (cluster, j, code). Everything downstream (cell
    * restriction via the assignment artifact, top-[[ivfAdcCand]] cut,
    * exact-L2 refine over raw floats) is the q145 shape.
    *
    * Measured on the fixture: recall@10 0.55 vs plain-code 0.56 —
    * PARITY, exactly what theory predicts for random-gaussian vectors
    * (the coarse centroids sit near the origin, so r ≈ v and the
    * residual codebooks learn the same geometry). The residual
    * recipe's win appears when clusters carry real structure
    * (residual variance ≪ total variance — every production embedding
    * corpus); the fixture documents the floor, LlmSpec pins
    * non-inferiority at equal probe/rerank budget. */
  def residualIvfAdcTopk(s: SparkSession, dir: String): DataFrame =
    adcRefine(s, dir, rpqAdcRanked(s, dir, probeBoost = 1)
      .filter(col("crank") <= ivfAdcCand).select(col("qid"), col("vec_id")))

  /** The RESIDUAL ADC candidate stage (q147's pre-refine leg), probe
    * budget = min(nlist, boost · base) — the per-(query, probed
    * cluster) LUT form; exposed like [[ivfAdcRanked]] so the specs can
    * grade residual-vs-plain at the ADC ordering itself. */
  private[graft] def rpqAdcRanked(
      s: SparkSession, dir: String, probeBoost: Int): DataFrame = {
    val c = ivfCentroids(s, dir)
    val clustered = ivfClusters(s, dir)
    val nlist = c.count() // model-sized count: O(nlist)
    val nprobe = math.min(nlist, ivfNprobe(nlist) * probeBoost)
    val cb = rpqCodebooks(s, dir)
    val qvec = vectors(s, dir).filter(col("vec_id") < 10)
      .localCheckpoint() // 10 rows — probe and LUT share it
    val q = qvec.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nrm").as("qn"))
    val wp = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(c))
      .withColumn("pcos",
        dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"), col("cv"))
    val qrsv = probes
      .withColumn("qr", zip_with(col("qv"), col("cv"), (a, b) => a - b))
      .select(col("qid"), col("cid").as("pcid"),
        explode(sequence(lit(0), lit(pqNsub - 1))).as("j"), col("qr"))
      .withColumn("x", expr(s"slice(qr, j * $pqDsub + 1, $pqDsub)"))
      .select(col("qid"), col("pcid"), col("j"), col("x"))
    val lut = qrsv.join(cb, "j")
      .withColumn("idist",
        round(l2sq(col("x"), col("c")) * lit(1e6), 0).cast("bigint"))
      .select(col("qid"), col("pcid"), col("j"),
        col("cid").as("code"), col("idist"))
    val codesByCell = rpqCodes(s, dir)
      .join(clustered.select(col("vec_id"), col("cid").as("pcid")),
        "vec_id")
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("idist"), col("vec_id"))
    codesByCell.join(broadcast(lut), Seq("pcid", "j", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("idist")).as("idist"))
      .withColumn("crank", row_number().over(wAdc))
  }

  /** q153: ANN RECALL REPORT — the serve paths' recall@10 as an
    * oracle-gated RELATION: the exact brute-force L2 top-10 (the q31
    * discipline, self-excluded, (d2, vec_id) tie-break) joins each
    * composed serve's output (q145 base budget, q150 multiprobe) and
    * reports hits + recall in integer micro units. This turns the
    * probe/recall trade from a test-log number into engine-queryable
    * observability — the knob's effect is data.
    *
    * Scale shape: the exact leg is the AUDIT cost — O(queries × corpus)
    * distance math, run on a sampled query set exactly like any recall
    * audit of a production ANN index (queries are a broadcast handful;
    * the corpus streams once per audit). The serve legs are the
    * candidate-bounded q145/q150 plans; all joins downstream of them
    * touch O(queries × k) rows. */
  def annRecallReport(s: SparkSession, dir: String): DataFrame = {
    val e = vectors(s, dir)
    val wx = Window.partitionBy(col("qid"))
      .orderBy(col("d2"), col("vec_id"))
    val exact = e.select(col("vec_id"), col("v"))
      .crossJoin(broadcast(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"))))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("d2", l2sq(col("v"), col("qv")))
      .withColumn("rank", row_number().over(wx))
      .filter(col("rank") <= pqRerankK)
      .select(col("qid"), col("vec_id"))
      .localCheckpoint() // O(queries × k) rows, consumed by both legs
    val nq = e.filter(col("vec_id") < 10).count()
    // probe volumes make the report the probe/recall TRADE relation:
    // fixed budgets are nq × budget by construction; the adaptive
    // path's is whatever the margin rule actually spent
    val nlist = ivfCentroids(s, dir).count()
    val baseNp = ivfNprobe(nlist)
    val capNp = math.min(nlist, baseNp * ivfMultiProbeBoost)
    def leg(served: DataFrame, path: String, probes: Long): DataFrame =
      served.select(col("qid"), col("vec_id"))
        .join(exact, Seq("qid", "vec_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(path).as("path"), lit(probes).as("probes"),
          col("hits"),
          expr(s"hits * 1000000L div (${pqRerankK}L * ${nq}L)")
            .as("recall_micro"))
    leg(ivfAdcTopk(s, dir), "base", nq * baseNp)
      .unionByName(leg(ivfAdcMultiprobeTopk(s, dir), "multiprobe",
        nq * capNp))
      .unionByName(leg(ivfAdcAdaptiveTopk(s, dir), "adaptive",
        ivfAdaptiveProbes(s, dir).count()))
      .orderBy(col("path"))
  }

  /** Encode vectors into PQ codes with a MAP-ONLY fold-argmin over the
    * broadcast codebook model — the PQ analog of [[vectorRouting]]:
    * the batch encoder's groupBy-min cannot start under append-mode
    * streaming, while this explode+fold projection is window/state-
    * free, so the SAME plan encodes a batch frame or a `readStream`
    * crawler feed into the persisted code format online. The fold
    * visits codebook entries in ascending cid order with strict-less
    * replacement, reproducing the batch `min(struct(d, cid))`
    * tie-break exactly (LlmSpec asserts routing ≡ [[pqCodes]] on the
    * corpus; StreamingSpec proves the streamed plan emits the batch
    * answer). The model rides as a broadcast single-row relation —
    * O(nsub·ksub·dsub) doubles shipped once per executor, the plan
    * stays O(1). */
  def pqRouting(s: SparkSession, dir: String, incoming: DataFrame): DataFrame =
    pqEncodeWith(s,
      incoming.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")),
      collectPqModel(s, pqCodebooks(s, dir)))

  /** Encode incoming vectors into the RESIDUAL code format online —
    * E137's ingestion face: route each vector to its coarse cluster
    * with the map-only fold-argmax ([[routeFrozen]], tie-break-
    * identical to the batch assignment), subtract the broadcast
    * centroid, and fold-argmin-encode the residual against the
    * broadcast residual codebooks. Every stage is a window/state-free
    * projection, so the SAME plan encodes a batch frame or a
    * `readStream` crawler feed into the exact code rows the persisted
    * [[rpqCodes]] artifact holds (StreamingSpec pins streamed ≡
    * artifact). */
  def rpqRouting(s: SparkSession, dir: String, incoming: DataFrame): DataFrame = {
    val cent = ivfCentroids(s, dir)
    val vecs = incoming.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val res = routeFrozen(s, vecs, cent)
      .join(broadcast(cent.select(col("cid"), col("cv"))), "cid")
      .select(col("vec_id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))
    pqEncodeWith(s, res, collectPqModel(s, rpqCodebooks(s, dir)))
  }

  /** Route vectors to their IVF cluster with a MAP-ONLY argmax over
    * the centroid model — no window, no shuffle, no state.
    * [[assignToCentroids]]'s window-rank formulation cannot run under
    * Structured Streaming (append mode forbids non-time windows); this
    * fold-argmax projection runs identically over a batch frame and a
    * `readStream` ingestion feed, so the vector half of a crawler
    * pipeline routes into the persisted IVF index online.
    *
    * The model rides as a BROADCAST single-row relation cross-joined
    * onto the feed (a broadcast nested-loop with one build row — still
    * map-only, still stream-static-safe), NOT as a plan literal: at
    * nlist ≈ 31 k (1e9 vectors) the literal is ~16 MB of doubles
    * re-serialized into every micro-batch's plan, while the broadcast
    * ships once per executor and the plan stays O(1). The fold visits
    * centroids in ascending cid order with strict-greater replacement,
    * reproducing the window's (cos DESC, cid ASC) tie-break exactly
    * (LlmSpec asserts routing ≡ ivfClusters on the corpus AND that the
    * plan carries no centroid literal; StreamingSpec proves the
    * streamed plan emits the batch answer). */
  def vectorRouting(s: SparkSession, dir: String, incoming: DataFrame): DataFrame = {
    import s.implicits._
    val cent = ivfCentroids(s, dir)
      .select(col("cid"), col("cv"), col("cn"))
      .as[(Long, Seq[Double], Double)]
      .collect().sortBy(_._1).toSeq
    val model = Seq(Tuple1(cent)).toDF("cs")
    val e = incoming
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    e.crossJoin(broadcast(model))
      .withColumn("best", aggregate(
        col("cs"),
        struct(lit(-1L).as("cid"), lit(-2.0).as("cos")),
        (acc, c) => {
          val cos = dot(c.getField("_2"), col("v")) /
            (c.getField("_3") * col("nrm"))
          when(cos > acc.getField("cos"),
            struct(c.getField("_1").as("cid"), cos.as("cos")))
            .otherwise(acc)
        }))
      .select(col("vec_id"), col("best.cid").as("cid"),
        round(col("best.cos"), 6).as("cos"))
  }

  /** IVF approximate top-k (X3 scale path): probe the [[ivfNprobe]]
    * nearest centroids per query, rank candidates only inside those
    * clusters — the scan is an equi-join on cluster id instead of
    * all-pairs. At 100 TB the cluster table is partitioned by `cid` and
    * each probe touches ~nprobe/nlist of the data. */
  def ivfTopk(s: SparkSession, dir: String): DataFrame =
    ivfTopkWith(s, dir, ivfCentroids(s, dir), ivfClusters(s, dir))

  /** [[ivfTopk]] against an explicit quantizer — lets the recall spec
    * compare the trained model to the raw stride init. */
  private[graft] def ivfTopkWith(
      s: SparkSession, dir: String, c: DataFrame, clustered: DataFrame): DataFrame = {
    val e = vectors(s, dir)
    val nprobe = ivfNprobe(c.count()) // model-sized count: O(nlist) rows
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wp = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(c))
      .withColumn("pcos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("qv"), col("qn"), col("cid"))
    val wk = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    // the probes side is O(queries·nprobe) — ALWAYS the build side.
    // Unhinted, AQE broadcasts whichever side fits at the test scale
    // and at sf0.1 picks the CLUSTER TABLE (its stats sit under the
    // threshold); at 100 TB that decision inverts into a full shuffle
    // of the index. The hint pins the probe-side map join that scales.
    broadcast(probes).join(clustered, "cid")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank").cast("bigint").as("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  /** One k-means (Lloyd) iteration over the IVF assignment — the index-
    * maintenance step of the X3 scale path: recompute each cluster's
    * centroid as the element-wise mean of its member vectors, via the
    * mergeable [[graft.functions.VectorAgg.vectorSum]] Aggregator — one
    * pass, one dim-length buffer per cluster per map partition, no 64×
    * dimension explosion through the shuffle. Output exploded to
    * (cid, dim) scalars so the oracle compares cell-by-cell. */
  def kmeansIteration(s: SparkSession, dir: String): DataFrame = {
    val vsum = udaf(graft.functions.VectorAgg.vectorSum,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
    ivfClusters(s, dir)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_assigned"), vsum(col("v")).as("sv"))
      .select(col("cid"), col("n_assigned"),
        posexplode(expr("transform(sv, x -> round(x / n_assigned, 6))"))
          .as(Seq("d", "cval")))
      .select(col("cid"), col("n_assigned"),
        (col("d") + 1).cast("bigint").as("dim"), col("cval"))
      .orderBy(col("cid"), col("dim"))
  }

  /** Embedding-cosine near-dup, IVF-bucketed: candidate pairs share a
    * cluster (equi-join on `cid`, never all-pairs), verified at
    * cosine ≥ 0.4. */
  def embedNearDup(s: SparkSession, dir: String): DataFrame = {
    val cl = ivfClusters(s, dir)
    val a = cl.select(col("cid"), col("vec_id").as("v1"),
      col("v").as("x1"), col("nrm").as("n1"))
    val b = cl.select(col("cid"), col("vec_id").as("v2"),
      col("v").as("x2"), col("nrm").as("n2"))
    a.join(b, "cid")
      .filter(col("v1") < col("v2"))
      .withColumn("cos", dot(col("x1"), col("x2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= 0.4)
      .select(col("v1"), col("v2"), round(col("cos"), 6).as("cos"))
      .orderBy(col("v1"), col("v2"))
  }

  /** TF-IDF top terms per language — the "what characterizes this
    * slice" view of vocabulary building (X4). Three relations, all
    * small after the first aggregation:
    *
    *  - `tf(lang, token)`: one hash agg over the exploded corpus
    *    (map-side combinable; heavy-hitter tokens are bounded per
    *    partition by the partial agg, same rationale as [[tokenFreq]]);
    *  - `df(token)`: distinct (doc, token) then an agg — vocabulary-
    *    sized, BROADCAST to the tf side (never shuffles tf);
    *  - `n_total`: a 1-row count, broadcast via cross join.
    *
    * Ranking outputs only integers (tf, df, rank) — the double tfidf
    * score orders but is not emitted, so oracle parity cannot hinge on
    * libm `ln` ulp differences. Top-5 per lang via a window over the
    * O(langs × vocab) scored relation. */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val toks = Llm.docs(s, dir)
      .select(col("lang"), col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
    val tf = toks.groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = toks.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val total = Llm.docs(s, dir).agg(count(lit(1)).as("n_total"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("tfidf").desc, col("token"))
    // NO broadcast hint on df: both sides are VOCABULARY-grain, and a
    // 100 TB web corpus' vocabulary (urls, ids, typos — Heaps' law)
    // is not a broadcastable relation; the token equi-join rides one
    // hash shuffle of two already-aggregated vocab-sized inputs (the
    // q157 stop-list lesson applied preemptively — AQE still
    // broadcasts when the fixture-sized df actually fits)
    tf.join(df, "token")
      .crossJoin(broadcast(total))
      .withColumn("tfidf",
        col("tf") * log(col("n_total").cast("double") / col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("lang"), col("rank").cast("bigint").as("rank"),
        col("token"), col("tf"), col("df"))
      .orderBy(col("lang"), col("rank"))
  }

  /** Containment (overlap-coefficient) near-dup pairs — the asymmetric
    * companion of [[jaccardPairs]]: |A∩B| / min(|A|,|B|) ≥ 0.8 catches
    * a short doc quoted inside a long one, which Jaccard misses because
    * the union is dominated by the long side. Reuses the shared
    * [[sizedPostings]] index: stop-shingle anti-join skew guard, per-doc
    * sizes riding inside the posting-list structs, pair counts emitted
    * from posting lists (one shuffle of the index) — no post-join of the
    * pair blow-up against a sizes table. */
  def containmentPairs(s: SparkSession, dir: String): DataFrame =
    Llm.pairCommonCounts(s, dir)
      .withColumn("containment",
        col("common") / least(col("n1"), col("n2")))
      .filter(col("containment") >= 0.8)
      .select(col("d1"), col("d2"), col("common"), col("n1"), col("n2"),
        round(col("containment"), 6).as("containment"))
      .orderBy(col("d1"), col("d2"))

  /** Character-n-gram language ID (X4's "n-gram heuristic" flavor —
    * [[langIdConfusion]] is the function-word flavor): score each
    * candidate language by occurrence counts of its signature character
    * bigrams, argmax with a fixed tie order. Occurrence counting is
    * `(len(text) - len(replace(text, g))) / len(g)` — pure integer
    * string arithmetic, map-only, engine-portable. */
  def charNgramLangId(s: SparkSession, dir: String): DataFrame = {
    def occ(c: Column, g: String): Column =
      (length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(g), ""))) / g.length
    val scored = Llm.docs(s, dir)
      .withColumn("en_score",
        occ(col("text"), "th") + occ(col("text"), "he") + occ(col("text"), "er"))
      .withColumn("fr_score",
        occ(col("text"), "le") + occ(col("text"), "ou") + occ(col("text"), "es"))
      .withColumn("de_score",
        occ(col("text"), "ei") + occ(col("text"), "ch") + occ(col("text"), "en"))
      .withColumn("predicted",
        when(col("en_score") >= col("fr_score") && col("en_score") >= col("de_score"), "en")
          .when(col("fr_score") >= col("de_score"), "fr")
          .otherwise("de"))
    scored.groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"),
        sum(col("en_score")).cast("bigint").as("sum_en_score"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** q121: embedding-coverage audit — the FULL OUTER reconciliation of
    * the text corpus against its vector sidecar: docs without an
    * embedding ("missing_embedding") are silently invisible to every
    * ANN/semantic-dedup operator, and orphan vectors waste index space
    * and can resurrect deleted documents through retrieval. One full
    * outer join on the id (a single hash shuffle of two id-only
    * projections — column pruning keeps text and vectors out of the
    * exchange) and a partial-agg report. The audit every multi-modal
    * warehouse should run after each ingest.
    *
    * The fixture corpus is perfectly covered, so the operator audits a
    * PLANTED drift state (the piiScrub scaffolding discipline, oracle
    * re-derived): docs with id % 89 == 0 "deleted" after embedding
    * (→ orphan vectors), embeddings with id % 97 == 0 "not yet
    * embedded" (→ missing) — all three statuses must surface. */
  def embeddingCoverage(s: SparkSession, dir: String): DataFrame = {
    // plain load, not the CPU-spread: this op is an id-only join+agg
    // with no per-row CPU stage, so a round-robin pre-shuffle would be
    // pure overhead before the join's own hash exchange
    val d = Tables.load(s, dir, "documents").select(col("doc_id"))
      .filter(col("doc_id") % 89 =!= 0)
    val e = Tables.load(s, dir, "embeddings").select(col("vec_id"))
      .filter(col("vec_id") % 97 =!= 0)
    d.join(e, d("doc_id") === e("vec_id"), "full_outer")
      .withColumn("status",
        when(col("doc_id").isNotNull && col("vec_id").isNotNull, "covered")
          .when(col("vec_id").isNull, "missing_embedding")
          .otherwise("orphan_vector"))
      .withColumn("id", coalesce(col("doc_id"), col("vec_id")))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
      .orderBy(col("status"))
  }

  /** q122: fuzzy dedup with blocking (record linkage over the part
    * vocabulary): Levenshtein-close name pairs found WITHOUT the
    * all-pairs product — each name emits two block keys (8-char
    * prefix and 8-char reversed-suffix, catching an edit at either
    * end), candidates are the equi-join within blocks, and the edit
    * distance runs on candidates only. That block-bounded shape is
    * the whole point at scale: O(Σ block²) with calibrated block
    * granularity, never O(n²); recall is the standard multi-block
    * trade-off (an edit in the MIDDLE of a long name can escape both
    * blocks — production adds more block passes, same plan). The
    * fixture vocabulary has no lev≤2 pairs, so the operator PLANTS
    * deterministic ` x`-suffixed variants (the piiScrub scaffolding
    * discipline — the oracle re-derives them) and must recover
    * exactly those pairs through the blocking. */
  def fuzzyNamePairs(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "part")
      .select(col("p_name").as("name")).distinct()
    val planted = base.filter(length(col("name")) % 2 === 0)
      .select(concat(col("name"), lit(" x")).as("name"))
    val names = base.unionByName(planted).distinct()
    val blocks = names.select(col("name"), explode(array(
        substring(col("name"), 1, 8),
        expr("substring(reverse(name), 1, 8)"))).as("blk"))
    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.name") < col("b.name"))
      .select(col("a.name").as("n1"), col("b.name").as("n2"))
      .distinct()
      .filter(levenshtein(col("n1"), col("n2")) <= 2)
      .withColumn("lev",
        levenshtein(col("n1"), col("n2")).cast("bigint"))
      .orderBy(col("n1"), col("n2"))
  }

}
