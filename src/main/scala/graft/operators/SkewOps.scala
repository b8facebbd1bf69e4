package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (build brief: "skewed keys → salting or AQE
  * skew-join").
  *
  * AQE (on by default in Spark 4) re-plans skewed SORT-MERGE JOINS at
  * runtime, but a skewed AGGREGATION still funnels every row of a hot key
  * through one task. Salting is the standard fix: split each key into
  * `nSalts` subkeys, aggregate partially per subkey (parallel), then
  * aggregate the subtotals (tiny). This composes exactly like map-side
  * partial aggregation, one level deeper.
  */
object SkewOps {

  private val SALT = "__salt__"

  /** Columns usable as xxhash64 input: Spark refuses to hash MapType
    * (anywhere in the type, map key order is undefined), so salting hashes
    * only the map-free columns. Requires at least one — a table that is
    * all maps has no retry-stable content hash. */
  private def hashableCols(df: DataFrame): Seq[Column] = {
    import org.apache.spark.sql.types._
    def ok(dt: DataType): Boolean = dt match {
      case _: MapType       => false
      case ArrayType(et, _) => ok(et)
      case StructType(fs)   => fs.forall(f => ok(f.dataType))
      case _                => true
    }
    // Backtick-quote each name (escaping embedded backticks) before column
    // resolution: a bare col("a.b") parses the dot as nested-field access
    // and either fails analysis or binds the wrong thing for valid schemas.
    def q(n: String) = "`" + n.replace("`", "``") + "`"
    val cs = df.schema.fields.filter(f => ok(f.dataType)).map(f => df(q(f.name)))
    require(cs.nonEmpty,
      "salting needs at least one non-map column to hash (map key order " +
        "is undefined, so maps cannot contribute to a content salt)")
    cs.toSeq
  }

  /** Two-stage salted aggregation for algebraic aggregates.
    *
    * @param partials stage-1 aggregates per (keys, salt) — e.g.
    *                 `Seq(sum($"v").as("s"), count(lit(1)).as("n"))`
    * @param finals   stage-2 re-aggregates over the salt subtotals, in
    *                 terms of the stage-1 names — e.g.
    *                 `Seq(sum($"s").as("total"), sum($"n").as("cnt"))`
    *
    * Correct for any aggregate expressible as a commutative monoid over
    * partials (sum, count, min, max, and means/variances via their
    * (sum, count[, m2]) decompositions) — the same contract map-side
    * partial aggregation already imposes.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], nSalts: Int)(
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    // Salt must be a pure function of row CONTENT: a partition-id/row-order
    // salt re-salts rows differently when Spark recomputes a lost map task
    // after a fetch failure, double-counting or dropping them in the
    // stage-2 re-aggregation. Content hashing is retry-stable; the trade
    // is that fully-identical rows share a salt (a hot key of literally
    // duplicate rows stays unsplit — dedup first if that's the shape).
    df.withColumn(SALT,
        pmod(xxhash64(hashableCols(df): _*), lit(nSalts)))
      .groupBy((keys.map(col) :+ col(SALT)): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted equi-join for a hot-keyed BIG side against a replicable small
    * side — the shuffle-join skew fix for when the small side is too big
    * to broadcast outright and AQE's skew splitting doesn't apply (e.g.
    * the skewed side feeds from an exchange AQE can't re-plan).
    *
    * Each big row gets a deterministic salt in [0, nSalts) hashed from
    * its row content (map-free columns only; reproducible across runs and
    * retries, unlike rand()); the small side is replicated nSalts× with
    * every salt value; the join key becomes (keys…, salt), splitting each
    * hot key's rows over nSalts tasks. Same caveat as [[saltedAgg]]:
    * fully-identical big-side rows share a salt, so a hot key made of
    * literal duplicate rows stays unsplit — dedup or pre-aggregate first
    * if that's the shape.
    *
    * Join types: `inner`, `left`/`left_outer`, `left_semi`, `left_anti`
    * — the ones where replicating the RIGHT side cannot duplicate or drop
    * output rows (each big row still joins exactly its own salt slice).
    * Anything else would multiply right-side rows; rejected. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val ok = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(ok.contains(joinType.toLowerCase),
      s"saltedJoin supports ${ok.mkString("/")}, not $joinType " +
        "(replicating the right side would corrupt other join types)")
    val bigS = big.withColumn(SALT,
      pmod(xxhash64(hashableCols(big): _*), lit(nSalts)).cast("int"))
    val smallS = small.withColumn(SALT,
      explode(array((0 until nSalts).map(i => lit(i)): _*)))
    bigS.join(smallS, keys :+ SALT, joinType).drop(SALT)
  }
}
