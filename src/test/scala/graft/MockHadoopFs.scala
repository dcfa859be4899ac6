package graft

/** A NON-`file` Hadoop FileSystem backed by the local disk — the test
  * double that drives [[graft.fs.DirLock]]'s cluster-store branch
  * (exclusive create via `FileSystem.create(path, overwrite=false)`,
  * rename-based steal, setTimes heartbeat) without an HDFS daemon:
  * DirLock dispatches on `getScheme`, so any scheme other than `file`
  * takes the Hadoop-API path end to end. Registered per test via
  * `fs.mockgraft.impl`. */
class MockHadoopFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockgraft"
  override def getUri: java.net.URI = java.net.URI.create("mockgraft:///")
}
