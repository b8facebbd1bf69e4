package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-independent EXACT digest of a canonical frame — the one
  * definition shared by every hash gate that must certify multiset
  * equality without collecting rows (StreamCorrectness's 15 streaming
  * arms, Sf10Probe's copy-0 differential slices): per-row `xxhash64`
  * over ALL columns, split into low/high 32-bit words, each word
  * summed separately beside a row count. Each summand is bounded by
  * 2^32, so even 2^30 rows stay inside int64 — overflow-free under
  * ANSI mode, no wrapping semantics to reason about on either side of
  * a compare. Computed distributed; only three longs reach the
  * driver. */
object FrameDigest {
  def of(df: DataFrame): (Long, Long, Long) = {
    val h = xxhash64(df.columns.map(col): _*)
    val r = df.select(h.bitwiseAND(lit(0xFFFFFFFFL)).as("hl"),
        shiftright(h, 32).as("hh"))
      .agg(count(lit(1)).as("c"), sum(col("hl")).as("sl"),
        sum(col("hh")).as("sh")).head
    (r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1),
      if (r.isNullAt(2)) 0L else r.getLong(2))
  }
}
