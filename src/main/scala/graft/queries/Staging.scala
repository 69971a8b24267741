package graft.queries

/** Per-dataset oracle-staging paths. A few queries stage an
  * intermediate table as a parquet artifact so their DuckDB oracle can
  * replay a non-SQL-expressible step (xxhash64 simhash bits,
  * distributed k-means PQ codebooks) from bit-identical values. The
  * path is keyed by the sanitized dir, a collision-proof hash of the
  * RAW dir string (sanitizing alone can collide: `.../sf0.1` and a
  * hypothetical `.../sf0_1` both sanitize to `sf0_1`, and a collision
  * would let [[dropStaleSiblings]] delete the OTHER dataset's live
  * stage), AND a cheap recursive content fingerprint of the source
  * table that also folds in the build stamp of this code — so a
  * _SUCCESS guard can never accept a stale stage after either the
  * dataset regenerates or the engine is rebuilt (a code change to
  * simhash64 / trainPqCodebooks re-stages automatically instead of
  * replaying a previous build's values), and concurrent sessions on
  * different datasets write disjoint paths (the r9 fixed-path
  * clobber). Stages are deliberately NOT TmpSweeper-swept: the
  * driver's DuckDB pass reads them after the Verify JVM exits;
  * [[dropStaleSiblings]] bounds /tmp to one live stage per dataset.
  */
object Staging {

  /** `/tmp/graft_<name>_<sanitized dir>_<hash of raw dir>@<fingerprint>`.
    * `@` splits the dataset identity from its version for
    * [[dropStaleSiblings]]; the raw-dir hash makes distinct dirs
    * distinct identities even when sanitization collides. */
  def pathFor(dir: String, name: String, table: String): String = {
    // build stamp folded HERE, where every stage key passes through —
    // a rebuild changes the tag, so no stage outlives the build whose
    // arithmetic produced it
    val tag = java.lang.Long.toHexString(
      fp(new java.io.File(s"$dir/$table")) * 31 + buildStamp)
    val raw = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir))
    s"/tmp/graft_${name}_${dir.replaceAll("[^A-Za-z0-9]", "_")}_$raw@$tag"
  }

  /** Build stamp folded into every fingerprint: mtime of THIS CLASS's
    * own .class resource (jar entry or classes-dir file). A rebuild
    * re-stages even if the dataset is byte-identical — the staged
    * values may embed the OLD build's arithmetic. Keying off the
    * class-file resource, not the code-source ROOT, matters for
    * classes-directory classpaths (sbt dev/test runs): recompiling a
    * nested .class does not touch the root dir's mtime, so a root
    * stamp silently replayed a previous build's staged floats in dev
    * (ADVICE r11). URLConnection.getLastModified resolves both
    * protocols: the entry file's mtime under `file:`, the enclosing
    * jar's entry/file time under `jar:`. 0 when unknowable (bootstrap
    * classloader), degrading to data-only keying. */
  private val buildStamp: Long =
    try {
      val res = getClass.getResource("Staging.class")
      if (res == null) 0L
      else {
        val conn = res.openConnection()
        conn.setUseCaches(false)
        val t = conn.getLastModified
        // jar entries can carry 0 timestamps (reproducible builds):
        // fall back to the jar file itself, then to nothing
        if (t != 0L) t
        else {
          val src = getClass.getProtectionDomain.getCodeSource
          if (src == null || src.getLocation == null) 0L
          else new java.io.File(src.getLocation.toURI).lastModified
        }
      }
    } catch { case _: Exception => 0L }

  /** Recursive (name, length, mtime) fingerprint — cheap (metadata
    * only), order-stable, and any rewrite of any part changes it.
    * [[pathFor]] folds [[buildStamp]] on top so code versions never
    * share stages. Residual risk (accepted): a same-length
    * regeneration inside one mtime granule of the SAME build is
    * invisible; fails in the safe direction (driver oracle mismatch,
    * never silent wrong-pass). */
  private def fp(f: java.io.File): Long = {
    val own = (f.getName.hashCode.toLong * 31 + f.length) * 31 + f.lastModified
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty)
        .sortBy(_.getName).map(fp).foldLeft(own)(_ * 31 + _)
    else own
  }

  /** Delete stages of OLDER fingerprints of `stage`'s (name, dir) so
    * /tmp holds one live stage per dataset, not one per regeneration.
    * In-flight temp dirs ([[publishOnce]]) use a `.graft_stage_tmp`
    * prefix that can never match a sibling pattern. */
  def dropStaleSiblings(stage: String): Unit = {
    val f = new java.io.File(stage)
    val prefix = f.getName.takeWhile(_ != '@')
    Option(f.getParentFile.listFiles()).getOrElse(Array.empty)
      .filter(o => o.getName.startsWith(prefix + "@") && o.getName != f.getName)
      .foreach(TmpSweeper.deleteRec)
  }

  /** Idempotent cross-JVM stage publication: if `stage/_SUCCESS` is
    * already present, no-op; otherwise run `write` against a private
    * temp dir and atomically rename it into place. Two concurrent
    * sessions staging the same (dataset, version) each write their own
    * temp; rename(2) is atomic on one filesystem, so exactly one wins
    * and the loser discards its temp — no session can overwrite a
    * stage another session's driver-side DuckDB pass is reading (the
    * pre-r11 `_SUCCESS`-guard + `mode(overwrite)` race). Both writers
    * produce bit-identical content only when `write` is deterministic;
    * for ulp-sensitive writers (trained PQ codebooks) the winner's
    * floats become THE staged truth, which is exactly the replay
    * contract. */
  def publishOnce(stage: String)(write: String => Unit): Unit = {
    val dst = new java.io.File(stage)
    if (new java.io.File(dst, "_SUCCESS").exists()) return
    dropStaleSiblings(stage)
    // hard-crash hygiene: a SIGKILL mid-write strands a temp dir no
    // finally block can reap. Sweep ABANDONED temps (hours old — any
    // live concurrent writer finishes in minutes) so repeated crashes
    // can't grow /tmp without bound; same-age-guarded so a racing
    // session's in-flight temp is never touched.
    Option(dst.getParentFile.listFiles()).getOrElse(Array.empty)
      .filter(o => o.getName.startsWith(".graft_stage_tmp_") &&
        o.lastModified < System.currentTimeMillis() - 6L * 3600 * 1000)
      .foreach(TmpSweeper.deleteRec)
    val tmp = new java.io.File(dst.getParentFile,
      s".graft_stage_tmp_${java.util.UUID.randomUUID().toString.take(12)}")
    try {
      write(tmp.getAbsolutePath)
      try
        java.nio.file.Files.move(tmp.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        // rename loser: another session published first — its stage is
        // equally valid (same fingerprint ⇒ same dataset + build)
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.FileSystemException
            if new java.io.File(dst, "_SUCCESS").exists() => ()
      }
    } finally TmpSweeper.deleteRec(tmp)
  }
}
