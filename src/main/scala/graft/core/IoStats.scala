package graft.core

/** Local-filesystem read counter — the "files opened" reality check
  * behind O(delta)-bytes claims. Exact in local mode (driver and
  * executors share the JVM and its Hadoop FileSystem statistics); on a
  * cluster the same question is answered by executor task input
  * metrics. Profiling aid only, never a control path. */
object IoStats {
  def fsBytesRead: Long = {
    val s = org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics.get("file")
    if (s == null) 0L
    else Option(s.getLong("bytesRead")).map(_.longValue).getOrElse(0L)
  }
}
