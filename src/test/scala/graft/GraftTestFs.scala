package graft

/** A second Hadoop filesystem SCHEME for the suite: `graftfs://` is
  * RawLocalFileSystem under a non-`file:` URI, so every SnapshotTable
  * path that round-trips through manifests, `_metadata.file_path`
  * comparisons, and FS-API calls is exercised with a scheme+authority
  * that must be *preserved*, exactly as an `s3a://bucket/...` root
  * would demand. Registered via `fs.graftfs.impl` in the spec.
  */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}
