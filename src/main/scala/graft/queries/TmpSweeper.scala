package graft.queries

/** JVM-exit sweeper for the per-invocation /tmp dirs the query suite
  * creates (fresh UUID store paths, stream checkpoints). The lazy
  * return-the-store-df optimization removed the inline teardown (it
  * cost a cache-fill + count job per call just to out-race the
  * delete); without a sweep a bench session's 4+ runs per query leaked
  * a store copy each (review r6). One hook, registered on first use;
  * deletion is best-effort — /tmp is scratch space.
  */
object TmpSweeper {
  private val paths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      paths.forEach { p =>
        try {
          val f = new java.io.File(p)
          if (f.getPath.startsWith("/tmp/")) deleteRec(f)
        } catch { case _: Throwable => () }
      }
    }, "graft-tmp-sweeper"))
  }
  /** Package-shared recursive delete (also the sweep primitive). */
  private[queries] def deleteRec(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRec)
    val _ = f.delete()
  }
  def register(path: String): Unit = { hook; val _ = paths.add(path) }
}
