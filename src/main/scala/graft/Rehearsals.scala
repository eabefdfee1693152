package graft

/** Shared plumbing for the rehearsal mains.
  *
  * Spark managed tables live under the session's warehouse dir, but a
  * FRESH session starts with an empty in-memory catalog: `DROP TABLE
  * IF EXISTS` is a no-op against tables a previous run created, yet
  * their data directories survive on disk, so the next CTAS fails
  * with LOCATION_ALREADY_EXISTS. Every rehearsal that writes managed
  * tables must clear its warehouse (or whole output) dir BEFORE the
  * SparkSession starts so the harness is re-runnable without manual
  * cleanup.
  */
object Rehearsals {

  /** Recursive delete; no-op when the path doesn't exist. */
  def rmTree(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => java.nio.file.Files.delete(q))
      finally walk.close()
    }
  }
}
