package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality profiling and constraint validation — the ingest-side
  * gate of a training-data pipeline (the role AWS Deequ / Great
  * Expectations play): profile what arrived, assert what must hold,
  * BEFORE the corpus flows into dedup/filter/pack stages.
  *
  * Both operators are single-aggregation-pass shapes: every statistic /
  * check compiles to one aggregate expression over one scan (map-side
  * partial aggregation, one exchange of ONE row), then the one-row
  * result explodes into the per-column / per-check report. At 100 TB
  * that is the minimum possible cost for exact answers; the known
  * caveat is exact `COUNT(DISTINCT)` on multiple columns (Spark plans
  * an Expand — one duplicated scan row per distinct-aggregate), which
  * a production profile would swap for `approx_count_distinct` at the
  * cost of oracle exactness.
  */
object Profile {

  /** Per-column profile: (col_name, n_nonnull, n_distinct, min_num,
    * max_num, min_str, max_str) — numeric columns report min/max as
    * DOUBLE (min_str/max_str null), string columns as STRING
    * (min_num/max_num null). One aggregation pass for ALL columns.
    */
  def profile(df: DataFrame, numericCols: Seq[String],
              stringCols: Seq[String]): DataFrame = {
    require(numericCols.nonEmpty || stringCols.nonEmpty, "no columns to profile")
    val all = numericCols ++ stringCols
    val aggs: Seq[Column] = all.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"), countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries =
      numericCols.map { c =>
        struct(lit(c).as("col_name"), col(s"nn_$c").as("n_nonnull"),
          col(s"nd_$c").as("n_distinct"),
          col(s"mn_$c").cast(DoubleType).as("min_num"),
          col(s"mx_$c").cast(DoubleType).as("max_num"),
          lit(null).cast(StringType).as("min_str"),
          lit(null).cast(StringType).as("max_str"))
      } ++ stringCols.map { c =>
        struct(lit(c).as("col_name"), col(s"nn_$c").as("n_nonnull"),
          col(s"nd_$c").as("n_distinct"),
          lit(null).cast(DoubleType).as("min_num"),
          lit(null).cast(DoubleType).as("max_num"),
          col(s"mn_$c").cast(StringType).as("min_str"),
          col(s"mx_$c").cast(StringType).as("max_str"))
      }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** A constraint over one table, reporting its violation count. */
  sealed trait Check { def name: String }
  /** `cols` combinations must be unique (violations = rows − distinct). */
  final case class Unique(name: String, cols: Seq[String]) extends Check
  /** `col` must be non-null. */
  final case class Complete(name: String, col: String) extends Check
  /** `col` must lie in [lo, hi]; nulls violate. */
  final case class InRange(name: String, col: String, lo: Double, hi: Double)
      extends Check
  /** `col` must be one of `values`; nulls violate. */
  final case class InSet(name: String, col: String, values: Seq[String])
      extends Check

  /** Run `checks` against `df` in ONE aggregation pass; returns
    * (check, violations, passed) ordered by check name.
    */
  def runChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks to run")
    require(checks.map(_.name).distinct.length == checks.length,
      "check names must be unique")
    val aggs: Seq[Column] = checks.map {
      case Unique(n, cols) =>
        (count(lit(1)) - countDistinct(col(cols.head), cols.tail.map(col): _*))
          .as(s"v_$n")
      case Complete(n, c) =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"v_$n")
      case InRange(n, c, lo, hi) =>
        sum(when(col(c).isNull || col(c) < lo || col(c) > hi, 1L)
          .otherwise(0L)).as(s"v_$n")
      case InSet(n, c, vs) =>
        sum(when(col(c).isNull || !col(c).isin(vs: _*), 1L)
          .otherwise(0L)).as(s"v_$n")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.map { c =>
      struct(lit(c.name).as("check_name"),
        coalesce(col(s"v_${c.name}"), lit(0L)).cast(LongType).as("violations"),
        (coalesce(col(s"v_${c.name}"), lit(0L)) === 0L).as("passed"))
    }
    one.select(explode(array(entries: _*)).as("c")).select("c.*")
      .orderBy("check_name")
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic between the
    * `valueCol` distributions of groups `a` and `b` of `groupCol`:
    * D = sup_x |F_a(x) − F_b(x)| — the standard distribution-drift
    * alarm between two ingest batches / sources / time windows.
    *
    * Exactness: the supremum is maximized over INTEGER cross products
    * |cum_a·n_b − cum_b·n_a| (exact in long for n_a·n_b < 2⁶³; at
    * larger counts this would move to DECIMAL), and only the final
    * division is floating point — one IEEE op, identical in both
    * engines. CDFs come from [[Scan.prefixSum]]'s range-partitioned
    * scan over the per-distinct-value counts, NOT a single-partition
    * window — the same skew-proof shape as the running-sum operators.
    *
    * Returns one row (n_a, n_b, d_stat).
    */
  def ksDrift(df: DataFrame, valueCol: String, groupCol: String,
              a: String, b: String): DataFrame = {
    val s = df.filter(col(groupCol).isin(a, b))
      .select(col(valueCol).as("v"),
        when(col(groupCol) === a, 1L).otherwise(0L).as("ca"),
        when(col(groupCol) === b, 1L).otherwise(0L).as("cb"))
    val totals = s.agg(sum(col("ca")), sum(col("cb"))).head
    require(!totals.isNullAt(0) && totals.getLong(0) > 0 &&
      totals.getLong(1) > 0,
      s"ksDrift needs non-empty samples for both '$a' and '$b'")
    val (na, nb) = (totals.getLong(0), totals.getLong(1))
    val g = s.groupBy(col("v"))
      .agg(sum(col("ca")).as("fa"), sum(col("cb")).as("fb"))
    val cum = Scan.prefixSum(
      Scan.prefixSum(g, Seq.empty, Seq("v"), "fa", "cuma"),
      Seq.empty, Seq("v"), "fb", "cumb")
    cum.agg(max(abs(col("cuma") * lit(nb) - col("cumb") * lit(na))).as("md"))
      .select(lit(na).as("n_a"), lit(nb).as("n_b"),
        (col("md").cast(DoubleType) /
          lit(na * nb).cast(DoubleType)).as("d_stat"))
  }

  /** Population Stability Index between the first and second time half
    * of each group's value distribution — the model-monitoring drift
    * score (banking scorecard tradition; cf. Siddiqi 2006):
    *
    *   PSI = Σ_buckets (p_A(b) − p_B(b)) · ln(p_A(b) / p_B(b))
    *
    * over `buckets` equal-width value bins (per group, min–max range),
    * sides split at the midpoint of the GLOBAL time range, and Laplace
    * (+1) smoothing so empty cells stay finite — the standard "<0.1
    * stable / 0.1–0.25 shifting / >0.25 drifted" gauge, complementing
    * [[ksDrift]] (exact sup-gap, two fixed cohorts) with a
    * bucket-decomposable score whose per-bucket terms localize WHERE
    * the distribution moved.
    *
    * Scale shape: one checkpointed narrow pass fans into three
    * combiner-friendly aggregations (global time range, per-group value
    * range, per-(group,bucket,side) counts); the tiny range tables
    * broadcast back. Per-bucket terms quantize to 12 dp DECIMAL before
    * the per-group sum (order-independent, hash-oracle-able). No
    * windows, no driver state beyond two scalars.
    *
    * Returns (group, n_a, n_b, psi[6 dp]).
    */
  def psiDrift(df: DataFrame, valueCol: String, tsUsCol: String,
               groupCol: String, buckets: Int = 10): DataFrame = {
    val cnt = timeSplitGrid(df, valueCol, tsUsCol, groupCol, buckets)
    val pa = (col("fa") + lit(1)).cast(DoubleType) / (col("na") + lit(buckets))
    val pb = (col("fb") + lit(1)).cast(DoubleType) / (col("nb") + lit(buckets))
    // r17 (verdict task #2): per-bucket terms quantize through the e12
    // FLOOR witness (exact LONG; PSI terms are ≥ 0 and ≤ ~ln n, so a
    // group's 10-term sum stays far under int64), and the 6-dp emission
    // is a pure integer half-up floordiv — ROUND(double, 12) was the
    // last engine-defined rounding in this dataflow
    cnt
      .select(col("g"), col("na"), col("nb"),
        graft.functions.intWitness((pa - pb) * log(pa / pb), 1000000000000L).as("term_e12"))
      .groupBy(col("g"))
      .agg(min(col("na")).as("n_a"), min(col("nb")).as("n_b"),
        sum(col("term_e12")).as("s12"))
      .select(col("g"), col("n_a"), col("n_b"),
        expr("(2 * s12 + 1000000) div 2000000").as("psi_e6"))
  }

  /** Jensen–Shannon divergence between the two time halves — the
    * bounded, symmetric companion to [[psiDrift]] (Lin 1991): with
    * m = (p+q)/2,
    *
    *   JS = ½ Σ_b p(b)·ln(p(b)/m(b)) + ½ Σ_b q(b)·ln(q(b)/m(b))
    *
    * JS ∈ [0, ln 2] always (PSI is unbounded and blows up on
    * near-empty cells even smoothed), so thresholds transfer across
    * metrics and corpora — the drift score to alert on when feeds have
    * wildly different volumes. Same machinery as PSI end to end
    * ([[timeSplitGrid]]): equal-width per-group bins, global-time-
    * midpoint split, Laplace smoothing, 12-dp DECIMAL term
    * quantization so the per-group sum is reduction-order-exact.
    * Returns (group, n_a, n_b, js[6 dp]).
    */
  def jsDrift(df: DataFrame, valueCol: String, tsUsCol: String,
              groupCol: String, buckets: Int = 10): DataFrame = {
    val cnt = timeSplitGrid(df, valueCol, tsUsCol, groupCol, buckets)
    val pa = (col("fa") + lit(1)).cast(DoubleType) / (col("na") + lit(buckets))
    val pb = (col("fb") + lit(1)).cast(DoubleType) / (col("nb") + lit(buckets))
    val m = (pa + pb) / lit(2.0)
    // e12 FLOOR witness + integer half-up emission, as in [[psiDrift]]
    cnt
      .select(col("g"), col("na"), col("nb"),
        graft.functions.intWitness((pa * log(pa / m) + pb * log(pb / m)) * lit(0.5)
           , 1000000000000L).as("term_e12"))
      .groupBy(col("g"))
      .agg(min(col("na")).as("n_a"), min(col("nb")).as("n_b"),
        sum(col("term_e12")).as("s12"))
      .select(col("g"), col("n_a"), col("n_b"),
        expr("(2 * s12 + 1000000) div 2000000").as("js_e6"))
  }

  /** The shared count-grid half of [[psiDrift]]/[[jsDrift]]: per
    * (group, bucket), the first-half/second-half counts (fa, fb) over a
    * DENSE (group × bucket) grid — a bucket empty on BOTH sides still
    * carries its Laplace term — plus the per-group totals (na, nb)
    * joined back. One checkpointed narrow pass fans into three
    * combiner-friendly aggregations; the tiny range tables broadcast.
    */
  private def timeSplitGrid(df: DataFrame, valueCol: String, tsUsCol: String,
                            groupCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val base = df.select(col(groupCol).as("g"),
        col(valueCol).cast(DoubleType).as("v"), col(tsUsCol).as("tu"))
      .localCheckpoint(true)
    // integral div (NOT `/` + cast): Spark's Divide is double division
    // and DuckDB's BIGINT cast rounds where Spark truncates — `div`
    // vs `//` agree exactly on the positive epoch range
    val piv = base.agg(min(col("tu")).as("mn"), max(col("tu")).as("mx"))
      .select(expr("(mn + mx) div 2").as("pivot"))
    val rng = base.groupBy(col("g"))
      .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    val binned = base.crossJoin(broadcast(piv)).join(broadcast(rng), "g")
      .select(col("g"),
        when(col("tu") <= col("pivot"), lit(1L)).otherwise(lit(0L)).as("ca"),
        when(col("tu") > col("pivot"), lit(1L)).otherwise(lit(0L)).as("cb"),
        when(col("vmax") === col("vmin"), lit(0L))
          .otherwise(least(floor((col("v") - col("vmin")) /
              ((col("vmax") - col("vmin")) / buckets)).cast(LongType),
            lit(buckets - 1L))).as("bk"))
    // dense (group × bucket) grid: a bucket empty on BOTH sides still
    // contributes its Laplace-smoothed term (1/(na+B) vs 1/(nb+B)),
    // which is nonzero whenever n_a != n_b — dropping it would
    // underestimate PSI relative to the smoothed definition above
    val grid = rng.select(col("g"))
      .withColumn("bk", explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    val cnt = grid.join(
        binned.groupBy(col("g"), col("bk"))
          .agg(sum(col("ca")).as("fa0"), sum(col("cb")).as("fb0")),
        Seq("g", "bk"), "left")
      .select(col("g"), col("bk"),
        coalesce(col("fa0"), lit(0L)).as("fa"),
        coalesce(col("fb0"), lit(0L)).as("fb"))
    val tot = cnt.groupBy(col("g"))
      .agg(sum(col("fa")).as("na"), sum(col("fb")).as("nb"))
    cnt.join(broadcast(tot), "g")
  }

  /** Frozen reference histogram for PSI monitoring: fixed bucket edges
    * (equal-width over the reference cohort's [vmin, vmax]) plus the
    * reference bucket counts. Tiny by construction (`buckets` longs), so
    * it ships to consumers as plan literals — the degenerate "broadcast"
    * that costs nothing per batch.
    */
  final case class PsiReference(vmin: Double, vmax: Double, counts: Array[Long])

  /** Build a [[PsiReference]] from a reference cohort — two
    * combiner-friendly aggregations (range, then per-bucket counts);
    * the only collect is `buckets` rows, bounded by construction.
    * Bucketing matches [[psiDrift]]: equal-width bins over [vmin, vmax]
    * with the top edge folded into the last bucket.
    */
  def psiReference(df: DataFrame, valueCol: String, buckets: Int = 10): PsiReference = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val v = df.select(col(valueCol).cast(DoubleType).as("v"))
    val r = v.agg(min(col("v")), max(col("v"))).head
    require(!r.isNullAt(0), "psiReference needs a non-empty reference cohort")
    val (vmin, vmax) = (r.getDouble(0), r.getDouble(1))
    val bk = if (vmax == vmin) lit(0L)
      else least(floor((col("v") - lit(vmin)) / lit((vmax - vmin) / buckets))
        .cast(LongType), lit((buckets - 1).toLong))
    val got = v.select(bk.as("bk")).groupBy(col("bk"))
      .agg(count(lit(1)).as("f")).collect()
      .map(row => row.getLong(0).toInt -> row.getLong(1)).toMap
    PsiReference(vmin, vmax, Array.tabulate(buckets)(i => got.getOrElse(i, 0L)))
  }

  /** Per-dimension moment profile of an embedding column — the
    * diagnostic that motivates (or rules out) dimension-reduction
    * tiers: near-zero-variance dimensions are free to project away
    * (the PCA-16 story), uniform variance says prefix/PCA truncation
    * will cost recall (the isotropic-testdata story, BASELINE.md r7).
    * One posexplode + one groupBy(dim) — the aggregate is
    * dims-bounded, the scan is one pass, no driver collection.
    *
    * Output: (dim 1-based, n, mean[6 dp], variance[6 dp] population).
    */
  def dimStats(vectors: DataFrame, vecCol: String): DataFrame = {
    // per-ELEMENT decimal quantization (the q_corr_stats pattern) makes
    // the moment sums exact and associative — reduction order cannot
    // move the hash. Each SUMMAND (x and x²) is quantized from the same
    // double in both engines; a cross-engine tie-direction disagreement
    // moves a sum by ≤ n·1e-14, invisible at the 6 dp output rounding.
    val d = DecimalType(28, 14)
    val x = vectors
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select((col("pos") + 1).cast(LongType).as("dim"),
        col("v").cast(DoubleType).as("x"))
    x.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x").cast(d)).as("sx"),
        sum((col("x") * col("x")).cast(d)).as("sxx"))
      .select(col("dim"), col("n"),
        // integer e6 witnesses (r16): the old rounded doubles needed a
        // +0.0 signed-zero guard; the LONG witness of a near-zero mean
        // is just 0 on both engines
        graft.functions.e6Witness(col("sx").cast(DoubleType) / col("n")).as("mean_e6"),
        graft.functions.e6Witness((col("sxx").cast(DoubleType) / col("n") -
          (col("sx").cast(DoubleType) / col("n")) *
          (col("sx").cast(DoubleType) / col("n")))).as("variance_e6"))
  }

  /** Referential integrity: rows of `child` whose `childCol` has no
    * match in `parent.parentCol` (null child keys violate). Returns the
    * same (check, violations, passed) single-row shape so it unions
    * with [[runChecks]]. The anti-join is the scalable form — at 100 TB
    * the parent key set shuffles once; no driver-side collection.
    */
  def riCheck(name: String, child: DataFrame, childCol: String,
              parent: DataFrame, parentCol: String): DataFrame = {
    val orphans = child.select(col(childCol).as("__k"))
      .join(parent.select(col(parentCol).as("__k")).distinct(),
        Seq("__k"), "left_anti")
    orphans.agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check_name"), col("violations").cast(LongType),
        (col("violations") === 0L).as("passed"))
  }
}
