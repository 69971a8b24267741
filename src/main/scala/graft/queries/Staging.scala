package graft.queries

/** Per-dataset oracle-staging paths. A few queries stage an
  * intermediate table as a parquet artifact so their DuckDB oracle can
  * replay a non-SQL-expressible step (xxhash64 simhash bits,
  * distributed k-means PQ codebooks) from bit-identical values. The
  * path is keyed by the sanitized dir AND a cheap recursive content
  * fingerprint of the source table, so a _SUCCESS guard can never
  * accept a stale stage after the dataset regenerates, and concurrent
  * sessions on different datasets write disjoint paths (the r9
  * fixed-path clobber). Stages are deliberately NOT TmpSweeper-swept:
  * the driver's DuckDB pass reads them after the Verify JVM exits;
  * [[dropStaleSiblings]] bounds /tmp to one live stage per dataset.
  */
object Staging {

  /** `/tmp/graft_<name>_<sanitized dir>@<fingerprint of dir/table>`.
    * `@` splits the dataset identity from its version for
    * [[dropStaleSiblings]]. */
  def pathFor(dir: String, name: String, table: String): String = {
    val tag = java.lang.Long.toHexString(fp(new java.io.File(s"$dir/$table")))
    s"/tmp/graft_${name}_${dir.replaceAll("[^A-Za-z0-9]", "_")}@$tag"
  }

  /** Recursive (name, length, mtime) fingerprint — cheap (metadata
    * only), order-stable, and any rewrite of any part changes it. */
  private def fp(f: java.io.File): Long = {
    val own = (f.getName.hashCode.toLong * 31 + f.length) * 31 + f.lastModified
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty)
        .sortBy(_.getName).map(fp).foldLeft(own)(_ * 31 + _)
    else own
  }

  /** Delete stages of OLDER fingerprints of `stage`'s (name, dir) so
    * /tmp holds one live stage per dataset, not one per regeneration. */
  def dropStaleSiblings(stage: String): Unit = {
    val f = new java.io.File(stage)
    val prefix = f.getName.takeWhile(_ != '@')
    Option(f.getParentFile.listFiles()).getOrElse(Array.empty)
      .filter(o => o.getName.startsWith(prefix + "@") && o.getName != f.getName)
      .foreach(TmpSweeper.deleteRec)
  }
}
