package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-versioned parquet table: atomic snapshot/append commits
  * with time-travel reads and snapshot-pinned garbage collection — the
  * minimal transactional-table layer an offline store needs once
  * writers and readers overlap (the lakehouse pattern: readers resolve
  * a MANIFEST, never a directory listing, so a half-written commit is
  * invisible and a concurrent compaction can't tear a scan).
  *
  * Layout under `dir`:
  * {{{
  *   data/<version>-<uuid>/part-*.parquet   one sub-dir of files per commit
  *   _manifests/v<10-digit-version>.json    file list, one per version
  * }}}
  *
  * Commit protocol: write the new data files to a fresh uuid'd
  * sub-directory (invisible to readers), then CLAIM the next version by
  * `create(manifest, overwrite = false)` — exclusive create is the
  * atomic primitive that exists on local FS, HDFS, and object stores
  * with preconditions, unlike rename-over-existing (POSIX rename
  * silently replaces, so rename can't detect the race). Losing the
  * claim re-resolves the head and retries with the next version number;
  * the data directory is commit-private so a retry never rewrites data.
  * A manifest that fails JSON validation (torn write from a crashed
  * claimant) is skipped on read — the table stays at the previous
  * version, and [[vacuum]] removes the wreckage.
  *
  * Scale: a manifest lists file PATHS (thousands of entries at 100 TB
  * — kilobytes of JSON), never data; appends carry the parent's list
  * forward so commit cost is O(new files). Reads hand Spark the exact
  * file list, so there is no recursive directory listing on the hot
  * path and snapshot isolation is free: a reader pinned at v3 is
  * untouched by later commits AND by vacuum, which only deletes data
  * unreferenced by every retained manifest.
  */
object VersionedTable {

  /** `schemaDdl` makes the zero-file version readable AS the table: a
    * snapshot of an empty frame has a schema but no part files, and a
    * schemaless emptyDataFrame would break every downstream column
    * reference on exactly that version. Absent only in pre-upgrade
    * manifests (read() then falls back). */
  final case class Manifest(version: Int, files: Seq[String],
      schemaDdl: Option[String] = None)

  private def fs(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val root = new Path(dir)
    (root.getFileSystem(spark.sessionState.newHadoopConf()), root)
  }

  private def manifestPath(root: Path, v: Int): Path =
    new Path(new Path(root, "_manifests"), f"v$v%010d.json")

  /** Every version number with a manifest FILE, valid or torn — the
    * claim space. A torn manifest still owns its number (its claimant
    * may just be slow), so new commits must allocate above it. */
  private def listedVersions(hfs: FileSystem, root: Path): Seq[Int] = {
    val mdir = new Path(root, "_manifests")
    if (!hfs.exists(mdir)) return Nil
    hfs.listStatus(mdir).toSeq
      .map(_.getPath.getName)
      // parse-guarded: one stray non-numeric v*.json (editor backup,
      // manual copy) must not take down every read and commit with a
      // NumberFormatException
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        scala.util.Try(n.stripPrefix("v").stripSuffix(".json").toInt).toOption }
      .flatten
      .sorted
  }

  /** Versions with a VALID manifest, ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val (hfs, root) = fs(spark, dir)
    listedVersions(hfs, root).filter(v => readManifest(hfs, root, v).isDefined)
  }

  /** Commit `df` as the next version. `append = false` → the new
    * version is exactly df (snapshot); `append = true` → parent's
    * files + df's files. Returns the committed version number. */
  def commit(spark: SparkSession, dir: String, df: DataFrame,
      append: Boolean = false, maxRetries: Int = 10): Int = {
    val (hfs, root) = fs(spark, dir)
    val (dataDir, written) = stage(hfs, root, df)
    // a commit that never claims a manifest must not leak its staged
    // copy (each failed attempt otherwise parked a full batch on disk
    // until vacuum — the failed-audit path already deletes)
    try claimLoop(spark, hfs, root, dir, written, append, maxRetries, df.schema.toDDL)
    catch { case e: Throwable => hfs.delete(dataDir, true); throw e }
  }

  /** Write-audit-publish (the WAP lakehouse pattern): stage the batch
    * to a commit-private data dir, audit WHAT WAS WRITTEN (the staged
    * files read back — so serialization itself is inside the audit),
    * and only claim a manifest version when every [[graft.functions.Validate.Rule]]
    * holds. A failed audit deletes the staged files and leaves the
    * table head untouched — readers never see the bad batch, which is
    * the whole point: the audit runs between write and publish, not
    * after readers already scanned it.
    *
    * @return (Some(version), report) on publish; (None, report) on a
    *         failed audit. The report frame is the [[graft.functions.Validate.report]]
    *         per-rule verdict either way (collected before the staged
    *         dir is deleted, so it stays valid on the failure path).
    */
  def commitAudited(spark: SparkSession, dir: String, df: DataFrame,
      rules: Seq[graft.functions.Validate.Rule],
      append: Boolean = false, maxRetries: Int = 10): (Option[Int], DataFrame) = {
    val (hfs, root) = fs(spark, dir)
    val (dataDir, written) = stage(hfs, root, df)
    val staged = spark.read.parquet(dataDir.toString)
    val reportDf = graft.functions.Validate.report(staged, rules)
    // collect before any deletion; rebuild as a local frame with the
    // report's OWN schema so the returned verdict stays valid after the
    // staged dir is gone
    val reportRows = reportDf.collect()
    val report = spark.createDataFrame(
      spark.sparkContext.parallelize(reportRows.toSeq, 1), reportDf.schema)
    if (reportRows.forall(_.getAs[Boolean]("pass")))
      (Some(
        try claimLoop(spark, hfs, root, dir, written, append, maxRetries,
          df.schema.toDDL)
        catch { case e: Throwable => hfs.delete(dataDir, true); throw e }),
        report)
    else {
      hfs.delete(dataDir, true)
      (None, report)
    }
  }

  /** Stage a batch into a commit-private uuid'd data dir (invisible to
    * readers until a manifest references it). */
  private def stage(hfs: FileSystem, root: Path, df: DataFrame): (Path, Seq[String]) = {
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = new Path(new Path(root, "data"), s"commit-$uuid")
    df.write.parquet(dataDir.toString)
    val written = hfs.listStatus(dataDir).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => s"data/commit-$uuid/${f.getPath.getName}")
      .sorted
    (dataDir, written)
  }

  private def claimLoop(spark: SparkSession, hfs: FileSystem, root: Path,
      dir: String, written: Seq[String], append: Boolean, maxRetries: Int,
      schemaDdl: String): Int = {
    var attempt = 0
    while (attempt < maxRetries) {
      attempt += 1
      // ONE listing resolves both the claim ceiling and the append
      // parent. Resolving them from two listings (the old shape) lost
      // updates: a commit landing between the listings advanced the
      // ceiling without advancing the captured parent, so the new
      // manifest chained off the stale parent and the interleaved
      // commit's files silently left the head (and vacuum then deleted
      // them as unreferenced).
      val listed = listedVersions(hfs, root)
      val ceiling = (0 +: listed).max
      // newest VALID manifest via a descending scan — stops at the
      // first hit instead of validating every manifest ever committed
      val validHead: Option[Manifest] =
        listed.sorted.reverse.iterator.map(v => readManifest(hfs, root, v))
          .collectFirst { case Some(m) => m }
      // A claimed slot with no valid head below it (empty table, first
      // appenders racing) is equally an in-flight or torn claimant:
      // without the isEmpty arm, concurrent first appends chain
      // parentFiles = Nil over a claimant mid-write on v1 — the same
      // lost-update shape as the non-empty case.
      if (append && ceiling > 0 &&
          (validHead.isEmpty || validHead.exists(_.version < ceiling))) {
        // a claimed slot above the valid head is a claimant mid-write:
        // appending over it would drop its files from the chain the
        // moment it completes. Wait for it to finish (ms) or stay torn
        // (crashed — vacuum clears it); bounded by maxRetries.
        Thread.sleep(50L * attempt)
      } else {
        val parentFiles = if (append) validHead.map(_.files).getOrElse(Nil) else Nil
        val next = ceiling + 1
        val json = manifestJson(Manifest(next, parentFiles ++ written, Some(schemaDdl)))
        if (claimAndWrite(hfs, manifestPath(root, next), json.getBytes("UTF-8")))
          return next
        // else: lost the claim race — re-resolve head and retry
      }
    }
    throw new java.io.IOException(
      s"VersionedTable.commit: could not claim a version after $maxRetries " +
        s"attempts at $dir — a torn manifest above the valid head blocks " +
        "appends until vacuum() clears it, or contention is extreme")
  }

  /** Read a pinned `version`, or the latest valid one. Latest is
    * resolved by the claimLoop's DESCENDING scan — first valid hit
    * wins — not by validating every manifest ever committed: an
    * append-heavy table (one manifest per micro-batch) otherwise paid
    * O(total versions) manifest reads on every table resolve,
    * forever (review r11). */
  def read(spark: SparkSession, dir: String, version: Option[Int] = None): DataFrame = {
    val (hfs, root) = fs(spark, dir)
    val v = version.getOrElse(
      listedVersions(hfs, root).sorted.reverse.iterator
        .find(cand => readManifest(hfs, root, cand).isDefined)
        .getOrElse(
          throw new java.util.NoSuchElementException(s"no committed version at $dir")))
    val m = readManifest(hfs, root, v).getOrElse(
      throw new java.util.NoSuchElementException(s"no valid manifest v$v at $dir"))
    if (m.files.isEmpty)
      // empty-but-TYPED: the version's schema survives so downstream
      // column references resolve exactly as on non-empty versions
      m.schemaDdl.map { ddl =>
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType.fromDDL(ddl))
      }.getOrElse(spark.emptyDataFrame)
    else spark.read.parquet(m.files.map(f => new Path(root, f).toString): _*)
  }

  /** Drop all but the `keepLast` newest versions and delete data files
    * no retained manifest references (including torn manifests and
    * orphaned commit dirs from crashed writers). Must not run
    * concurrently with an in-flight commit: an orphan dir is
    * indistinguishable from a commit that has not claimed yet. */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 1): (Seq[Int], Int) = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val (hfs, root) = fs(spark, dir)
    val all = versions(spark, dir)
    val (dropped, kept) = all.splitAt(math.max(0, all.length - keepLast))
    val live: Set[String] =
      kept.flatMap(v => readManifest(hfs, root, v).map(_.files).getOrElse(Nil)).toSet
    dropped.foreach(v => hfs.delete(manifestPath(root, v), false))
    // torn manifests (listed but invalid) are wreckage: delete
    val mdir = new Path(root, "_manifests")
    if (hfs.exists(mdir)) hfs.listStatus(mdir).foreach { f =>
      val n = f.getPath.getName
      val v = scala.util.Try(n.stripPrefix("v").stripSuffix(".json").toInt).toOption
      if (v.exists(x => !kept.contains(x))) hfs.delete(f.getPath, false)
    }
    var deletedFiles = 0
    val ddir = new Path(root, "data")
    if (hfs.exists(ddir)) hfs.listStatus(ddir).foreach { cd =>
      if (cd.isDirectory) {
        hfs.listStatus(cd.getPath).foreach { f =>
          val rel = s"data/${cd.getPath.getName}/${f.getPath.getName}"
          if (f.isFile && !live.contains(rel)) {
            hfs.delete(f.getPath, false); deletedFiles += 1
          }
        }
        if (hfs.listStatus(cd.getPath).isEmpty) hfs.delete(cd.getPath, true)
      }
    }
    (dropped, deletedFiles)
  }

  /** Atomically claim `path` and write `bytes`; false = slot taken.
    * On the local filesystem Hadoop's create(overwrite = false) is an
    * exists()-then-create TOCTOU race, NOT atomic — two concurrent
    * committers could both "win" a version and one manifest would
    * silently replace the other. There java.io.File.createNewFile
    * (O_CREAT|O_EXCL) is the real atomic primitive; on HDFS and
    * precondition-capable stores the namenode enforces exclusive
    * create server-side. Non-claim I/O failures (permissions, disk
    * full) PROPAGATE instead of masquerading as a lost race. */
  private def claimAndWrite(hfs: FileSystem, path: Path, bytes: Array[Byte]): Boolean = {
    hfs match {
      case _: org.apache.hadoop.fs.LocalFileSystem |
           _: org.apache.hadoop.fs.RawLocalFileSystem =>
        val f = new java.io.File(path.toUri.getPath)
        f.getParentFile.mkdirs()
        if (!f.createNewFile()) return false // atomic O_EXCL claim
        val out = new java.io.FileOutputStream(f)
        try out.write(bytes) finally out.close()
        true
      case _ =>
        val out =
          try hfs.create(path, false)
          catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => return false
            case _: java.nio.file.FileAlreadyExistsException => return false
          }
        try out.write(bytes) finally out.close()
        true
    }
  }

  // ---- manifest (de)serialization: flat JSON, no library ------------

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def manifestJson(m: Manifest): String = {
    val files = m.files.map(f => "\"" + esc(f) + "\"")
    val schema = m.schemaDdl.map(d => s""","schema":"${esc(d)}"""").getOrElse("")
    s"""{"version":${m.version},"files":[${files.mkString(",")}]$schema,"complete":true}"""
  }

  private[sources] def readManifest(hfs: FileSystem, root: Path, v: Int): Option[Manifest] = {
    val p = manifestPath(root, v)
    if (!hfs.exists(p)) return None
    val in = hfs.open(p)
    val raw = try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      buf.toString("UTF-8")
    } finally in.close()
    // the trailing marker is the torn-write guard: a manifest without it
    // was mid-write when its claimant died
    if (!raw.trim.endsWith("\"complete\":true}")) return None
    val filesRe = """"files":\[(.*?)\]""".r
    // greedy to the single trailing marker, so escaped quotes inside
    // the DDL cannot end the match early
    val schemaRe = """"schema":"(.*)","complete"""".r
    filesRe.findFirstMatchIn(raw).map { m =>
      val body = m.group(1)
      val files =
        if (body.isEmpty) Nil
        else body.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")
          .replace("\\\"", "\"").replace("\\\\", "\\"))
      val schema = schemaRe.findFirstMatchIn(raw)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
      Manifest(v, files, schema)
    }
  }
}
