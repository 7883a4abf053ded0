package graft

import org.apache.spark.sql.DataFrame

/**
 * Frozen goldens for the `no_oracle` board queries whose outputs are
 * DETERMINISTIC given the seed (xxhash64-keyed MinHash/SimHash banding,
 * learned-BPE merges, Gumbel keys, the seeded simulation generator, and
 * the per-row IF97 dispatch — no cross-partition float accumulation
 * anywhere, verified by identical hashes at local[4] vs local[7]).
 * DuckDB cannot mirror xxhash64, so these queries cannot join the SQL
 * oracle board; a canonical-form SHA-256 frozen here is the
 * driver-independent equivalent: any change to the algorithm, the hash
 * seeds, or the band layout fails this suite loudly.
 *
 * If the driver regenerates the sf0.001 tables with different content,
 * every hash below shifts together — refreeze via tools/golden.scala
 * (usage in its trailing comment): a one-query drift is an algorithm
 * change; an all-query drift is a data regen.
 */
class GoldenSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** canonical form: columns sorted by name, values stringified, rows
    * sorted, SHA-256 over the joined lines (first 16 hex chars) */
  private def canon(df: DataFrame): String = {
    val cols = df.columns.sorted
    val rows = df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(v => if (v == null) " " else v.toString).mkString("|"))
      .sorted
    val h = java.security.MessageDigest.getInstance("SHA-256")
    rows.foreach(r => h.update((r + "\n").getBytes("UTF-8")))
    h.digest().map("%02x".format(_)).mkString.take(16)
  }

  private val golden = Map(
    "q_minhash_pairs" -> "ffeb117123861bf4",
    "q_simhash_pairs" -> "f2906c8ebd66f0b9",
    "q_minhash_dedup" -> "086b14ce00a2f66b",
    "q_minhash_index_dedup" -> "e5997657358278ec",
    "q_bpe_tokens" -> "93d7107ca75ae410",
    "q_importance_sample" -> "2e9306b963c3b0e8",
    "q_simulation" -> "a615e51f7a742c7e",
    "q_if97_props" -> "aa5f9c2f0c2217f0",
    // refrozen r12: the 16.53-22.06 MPa band now evaluates through the
    // region-3 saturation construction instead of returning nulls
    "q_saturated_steam" -> "8d98ffd7d5ef0b4c")

  for ((name, want) <- golden.toSeq.sortBy(_._1)) {
    test(s"$name matches its frozen golden") {
      val got = canon(SparkEntry.queries(name)(spark, sf))
      assert(got == want,
        s"$name canonical hash drifted: got $got, frozen $want — algorithm " +
          "change, seed change, or testdata regen (see scaladoc)")
    }
  }
}
