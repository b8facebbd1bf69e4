package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 → sf10 spot probe for the TOPOLOGY-SENSITIVE keys (round-14,
  * r13 verdict item 2): SF1CORRECTNESS + Sf1Probe prove the 10×
  * direction; the 100 TB claims for the keys whose cost depends on
  * graph/bin/span topology — cluster-propagation round counts, span
  * dup fan-in, interval bin explosion, multi-round edge relaxation —
  * rested on design arguments past sf1. This main materializes a
  * 100×-of-sf0.1 fixture (~60M lineitem rows / 10M events / 600k
  * docs) by composing [[Sf1Probe.buildScaled]] a second time (fresh
  * `zz9dup` token tag — see its scaladoc for why re-tagging matters,
  * and the tag is a sentinel no corpus token can start with (r14
  * advice: a plain `d` prefix could silently shrink the certified
  * collocation slice if a real token matched `d[0-9]_`); no
  * embeddings: none of the probed keys read them) and, per key:
  *
  *   - times sf1 vs sf10 in the SAME session (min of two passes each;
  *     ratio ≈ 10 is linear scaling for 10× input);
  *   - checks the 10-independent-copies ROW invariant (rows(sf10) =
  *     10 × rows(sf1); the nation-keyed graph key instead pins
  *     rows(sf10) = rows(sf1) — same 25-node domain);
  *   - where the construction makes copy 0 of sf10 BIT-IDENTICAL to
  *     sf1 (key-local computations — five of six keys), hash-gates
  *     the copy-0 SLICE of the sf10 result against the full sf1
  *     result: an exact differential correctness check at 100× with
  *     no external oracle. (graph_shortest_path_k is excluded by
  *     design: its edge weights derive from GLOBAL trade volume, so
  *     values legitimately change with scale.)
  *
  * Run: `sbt "runMain graft.Sf10Probe"` → SF10PROBE.json. */
object Sf10Probe {

  /** (key, rows multiplier sf1→sf10, copy-0 slice for the
    * differential hash gate — None when values legitimately change
    * with global scale). The slice fn gets (df, maxSf1DocId,
    * maxSf1SuppKey). */
  private type Slice = (DataFrame, Long, Long) => DataFrame
  val Keys: Seq[(String, Int, Option[Slice])] = Seq(
    ("dedup_clusters_distributed", 10,
      Some((df, maxDoc, _) => df.filter(col("doc_id") <= maxDoc))),
    ("text_dedup_passages", 10,
      Some((df, maxDoc, _) => df.filter(col("doc_id") <= maxDoc))),
    ("join_interval_overlap", 10,
      Some((df, _, maxSupp) => df.filter(col("l_suppkey") <= maxSupp))),
    ("window_rolling_minmax_wide", 10,
      Some((df, _, maxSupp) => df.filter(col("l_suppkey") <= maxSupp))),
    // collocation counts are per-copy-local but PMI carries the GLOBAL
    // totals — slice compares (bg, cnt) only; copy-0 bigrams are
    // exactly the sf1 strings (copies 1-9 carry the sentinel
    // zz9dup{i}_ tag, which no corpus token can start with)
    ("text_collocations", 10,
      Some((df, _, _) => df.filter(!col("bg").rlike("^zz9dup[0-9]_"))
        .select(col("bg"), col("cnt")))),
    // weights = f(global trade volume): values change with scale by
    // design; the 25-nation output domain must not
    ("graph_shortest_path_k", 1, None),
    // round-14 widening: the banded-LSH candidate pipeline (copy-local
    // pairs — disjoint shingle spaces), the two-limb retraction
    // carrier at w=200, and the second fixed-domain iterative graph
    // key (pagerank: 25 nations, volumes change values, domain fixed)
    ("dedup_minhash", 10,
      Some((df, maxDoc, _) => df.filter(col("doc_a") <= maxDoc))),
    ("window_rolling_std_wide", 10,
      Some((df, _, maxSupp) => df.filter(col("l_suppkey") <= maxSupp))),
    ("graph_pagerank", 1, None))

  /** the shared order-independent exact digest
    * ([[graft.functions.FrameDigest]]). */
  private def digest(df: DataFrame): (Long, Long, Long) =
    graft.functions.FrameDigest.of(df)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    // dir is tag-suffixed so a stale fixture built with an older tag
    // (its _READY gate would skip the rebuild) can never be probed
    val sf10 = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR",
      "/tmp/graft_sf10_zz9dup")
    System.err.println("[sf10probe] building sf1 (10x sf0.1) ...")
    Sf1Probe.buildSf1(spark, "/root/testdata/sf0.1", sf1)
    System.err.println("[sf10probe] building sf10 (10x sf1, tag zz9dup) ...")
    Sf1Probe.buildScaled(spark, sf1, sf10, copies = 10, tag = "zz9dup",
      withEmbeddings = false)

    val maxDoc = spark.read.parquet(s"$sf1/documents.parquet")
      .agg(max(col("doc_id"))).head.getLong(0)
    val maxSupp = spark.read.parquet(s"$sf1/lineitem.parquet")
      .agg(max(col("l_suppkey"))).head.getLong(0)

    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val probe = only.fold(Keys) { o => Keys.filter(k => o(k._1)) }

    // warmup (codegen/JIT) at the smallest sf, like Bench/Sf1Probe
    probe.foreach { case (k, _, _) =>
      try SparkEntry.queries(k)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    System.gc()

    def time(k: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(k)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def best(k: String, dir: String): Double =
      math.min(time(k, dir), time(k, dir))
    def r3(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

    var bad = List.empty[String]
    val rows = probe.map { case (k, mulWant, slice) =>
      val t1 = best(k, sf1)
      val t10 = best(k, sf10)
      val r1 = SparkEntry.queries(k)(spark, sf1).count()
      val r10 = SparkEntry.queries(k)(spark, sf10).count()
      val rowsOk = r10 == mulWant * r1
      val hashOk = slice.map { sl =>
        val want = digest(sl(SparkEntry.queries(k)(spark, sf1),
          maxDoc, maxSupp))
        val got = digest(sl(SparkEntry.queries(k)(spark, sf10),
          maxDoc, maxSupp))
        want == got
      }
      if (!rowsOk || hashOk.contains(false)) bad ::= k
      System.err.println(f"[sf10probe] $k%-28s sf1 ${t1}%7.2fs  " +
        f"sf10 ${t10}%8.2fs  ratio ${t10 / t1}%5.2fx  " +
        f"rows $r1%9d -> $r10%10d (x$mulWant ${rowsOk}%-5s)  " +
        s"slice_hash ${hashOk.map(_.toString).getOrElse("n/a")}")
      s""""$k":{"sf1":${r3(t1)},"sf10":${r3(t10)},""" +
        s""""ratio":${r3(t10 / t1)},"rows_sf1":$r1,"rows_sf10":$r10,""" +
        s""""rows_mult_want":$mulWant,"rows_ok":$rowsOk,""" +
        s""""slice_hash_match":${hashOk.map(_.toString).getOrElse("null")}}"""
    }
    val line = s"""{"metric":"sf10probe","unit":"sec","fixture":""" +
      s""""100x sf0.1 (10x sf1, tag zz9dup, no embeddings)","keys":{""" +
      rows.mkString(",") + "}}"
    println(line)
    if (only.isEmpty)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("SF10PROBE.json"), line + "\n")
      catch { case _: Throwable => () }
    spark.stop()
    if (bad.nonEmpty) {
      System.err.println(s"[sf10probe] GATE FAIL: ${bad.reverse.mkString(",")}")
      sys.exit(1)
    }
  }
}
