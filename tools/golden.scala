import org.apache.spark.sql.DataFrame
def canon(df: DataFrame): String = {
  val cols = df.columns.sorted
  val rows = df.select(cols.head, cols.tail: _*).collect()
    .map(_.toSeq.map(v => if (v == null) " " else v.toString).mkString("|"))
    .sorted
  val h = java.security.MessageDigest.getInstance("SHA-256")
  rows.foreach(r => h.update((r + "\n").getBytes("UTF-8")))
  h.digest().map("%02x".format(_)).mkString.take(16)
}
val d = "/root/testdata/sf0.001"
for (q <- Seq("q_minhash_pairs", "q_simhash_pairs", "q_minhash_dedup", "q_minhash_index_dedup", "q_bpe_tokens", "q_importance_sample", "q_simulation", "q_if97_props", "q_saturated_steam")) {
  val fn = graft.SparkEntry.queries(q)
  println(s"GOLD $q " + canon(fn(spark, d)))
}
sys.exit(0)
// Refreeze helper for GoldenSpec: run via
//   /opt/spark/bin/spark-shell --master 'local[4]' \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true -i tools/golden.scala
// and paste the GOLD lines into src/test/scala/graft/GoldenSpec.scala.
