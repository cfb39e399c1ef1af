package graft.sources

/** Cross-PROCESS commit-lock stress driver: performs `n` metadata-only
  * append commits against one IcebergLite table and exits 0 iff every
  * commit landed. SourcesSpec launches several real JVMs running this
  * main concurrently against a shared table — the r7 4-thread stress
  * shared one JVM, so the O_EXCL + atomic-rename lock protocol
  * (`withCommitLock`) was cross-process by construction but only
  * proven within a process; this closes that gap with genuinely
  * independent processes contending on the same lock file.
  *
  * Commits are metadata-only (empty manifests through the REAL
  * `commitSnapshot` path: parent validation, append rebase on
  * conflict, fencing, pointer flip) so the stress needs no
  * SparkSession — JVM startup stays cheap and the contention window
  * concentrates on the lock, which is the thing under test. A short
  * deterministic jitter (seeded by pid) interleaves the writers.
  * Prints one committed snapshot id per line for post-mortems. */
object LockStressMain {
  def main(args: Array[String]): Unit = {
    val tablePath = args(0)
    val n = args(1).toInt
    val rnd = new scala.util.Random(ProcessHandle.current().pid())
    var i = 0
    while (i < n) {
      val parent = IcebergLite.currentSnapshotId(tablePath)
      val id = IcebergLite.commitSnapshot(tablePath, parent,
        entries = Nil,
        carriedManifests = IcebergLite.parentManifests(tablePath, parent),
        rebaseOnConflict = true)
      println(id)
      Thread.sleep(rnd.nextInt(5).toLong)
      i += 1
    }
  }
}
