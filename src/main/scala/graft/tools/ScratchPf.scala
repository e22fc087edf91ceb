package graft.tools
import org.apache.spark.sql.SparkSession

/** r11 scratch probe for the q142 scale diagnosis: candidate/verified
  * counts and times for the prefix-filter join on (a) the driver-shaped
  * fixed-vocab corpora at sf0.1/sf1 and (b) the Heaps-law twins
  * ([[GenScale.heapsBaseText]]) at the same sizes. Separates corpus
  * gram-space saturation (fixed 31-word vocab → quadratic candidates)
  * from engine behavior (Heaps vocab → sublinear candidates).
  */
object ScratchPf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpora = Seq(
      ("sf0.1-fixed", "/root/testdata/sf0.1", "documents"),
      ("sf1-fixed", "/root/repo/testdata-sf1", "documents"),
      ("sf0.1-heaps", "/root/repo/testdata-sf01x", "documents_heaps"),
      ("sf1-heaps", "/root/repo/testdata-sf1", "documents_heaps"))
    for ((label, dir, tbl) <- corpora) {
      val docs = spark.read.parquet(s"$dir/$tbl.parquet")
      val t0 = System.nanoTime()
      val (cands, _, blocks) = graft.dedup.Dedup.prefixCandidates(
        docs, "doc_id", "text", 1, 2, 3, suffixFilter = false)
      val n = cands.count()
      graft.dedup.Checkpoints.release(blocks)
      println(f"[pf] $label candidates=$n%d candTime=${(System.nanoTime() - t0) / 1e9}%.1fs")
      val t1 = System.nanoTime()
      val out = graft.dedup.Dedup.prefixFilterPairs(docs, "doc_id", "text", 1, 2, 3)
      println(f"[pf] $label verified=${out.count()}%d fullTime=${(System.nanoTime() - t1) / 1e9}%.1fs")
      graft.dedup.Checkpoints.releaseOutputs()
    }
    spark.stop()
  }
}
