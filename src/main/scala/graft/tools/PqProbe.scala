package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/graft_sf5"
    val s = SparkSession.builder().master("local[32]").appName("pqprobe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](l: String)(b: => A): A = { val t0 = System.nanoTime(); val r = b; println(f"[pq] $l%-18s ${(System.nanoTime()-t0)/1e9}%.1f s"); r }
    val corpus = graft.sources.Tables.load(s, dir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    t("serve (warm index)") { graft.ann.Ann.pqServed(s, dir).count() }
    val root = graft.ann.PqIndex.indexRoot(dir)
    t("drop index") { Seq("coarse","books","codes").foreach(x => graft.lake.SnapshotTable.drop(s, s"$root/$x")) }
    
    t("full buildAt") { graft.ann.PqIndex.buildAt(s, root, corpus, 4, 16, 16, 2, meta = Map("corpus_fp" -> "probe")) }
    s.stop()
  }
}
