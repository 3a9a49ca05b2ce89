package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact interpolated quantiles for CORPUS-SIZED groups under a
  * bounded group-key set — the scale-safe replacement for the exact
  * `Percentile` aggregate, which buffers every value of a group in
  * one boxed in-memory map (fine at thousands of rows per group,
  * impossible when a group is a terabyte of doubles).
  *
  * Semantics are the Percentile aggregate's exactly: pos = q·(n−1)
  * over the sorted non-null values, v = v_lo + frac·(v_hi − v_lo) —
  * so the two paths below are interchangeable bit-for-bit and every
  * existing DuckDB `quantile_cont` oracle keeps matching.
  *
  * - Below `smallGate` total rows: ONE `percentile(v, array(qs))`
  *   aggregate — the current engine behavior, cheapest at spec/test
  *   scale.
  * - Above: sketch-placed equal-frequency bucket rank selection
  *   (the revenue_theil_sen machinery, generalized to grouped input):
  *   (1) one pass computes per-group counts and an approx_percentile
  *   sketch whose ONLY job is to place ~equal-count bucket
  *   boundaries — approximation places boundaries, never values;
  *   (2) one pass counts (group, bucket) cells exactly (bounded
  *   artifact: groups × buckets rows to the driver); (3) only the
  *   buckets containing a wanted rank are row_number-sorted — ~n/64
  *   rows per group instead of the whole group — and the exact global
  *   rank of a fetched row is its exact local rank plus the exact
  *   driver-side prefix of exact bucket counts. Equal-WIDTH buckets
  *   would collapse under heavy-tailed value distributions (measured
  *   on the Theil–Sen slope frame: min/max ride outliers and ~all
  *   mass lands in 1-2 buckets); equal-frequency buckets are immune
  *   by construction.
  *
  * Scale shape: three corpus passes, all partial-aggregable or
  * filter+bounded-sort; driver state is groups × buckets counters and
  * ≤ 2·|qs| fetched values per group. Degenerate all-tied groups
  * collapse every row into bucket 0 and the sort of ties is linear.
  */
object RankSelect {

  /** Per-group exact interpolated quantiles of `valCol` at fractions
    * `qs`. Group keys are read as strings (callers group by bounded
    * categorical keys; pass `lit("_")` for ungrouped input). Returns
    * group → (non-null row count, values aligned with `qs`); groups
    * with zero non-null values are absent.
    */
  def groupedQuantiles(df: DataFrame, groupCol: Column, valCol: Column,
                       qs: Seq[Double], smallGate: Long = 1L << 20,
                       nBuckets: Int = 64): Map[String, (Long, Seq[Double])] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))
    val g = df.select(groupCol.cast("string").as("g"),
      valCol.cast("double").as("v")).filter($"v".isNotNull)

    // pass 1: per-group count + boundary sketch (constant memory per
    // partition; the fractions split each group into ~equal buckets).
    // The count rides the sketch pass, so the small-data gate costs no
    // extra corpus pass; below the gate the exact Percentile aggregate
    // re-reads what is by definition a small frame.
    val fracs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val stat = g.groupBy($"g")
      .agg(count(lit(1)).as("n"),
        expr(s"approx_percentile(v, array(${fracs.mkString(",")}), 10000)")
          .as("bs"))
      .collect()
    val nByG = stat.map(r => r.getString(0) -> r.getLong(1)).toMap
    if (nByG.isEmpty) return Map.empty
    if (nByG.values.sum <= smallGate) {
      return g.groupBy($"g")
        .agg(count(lit(1)).as("n"),
          expr(s"percentile(v, array(${qs.mkString(",")}))").as("p"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Double](2)))
        .toMap
    }
    // each group's boundary array folds into the plan as a LITERAL
    // branch of one case expression (groups are bounded by contract) —
    // a boundary-table broadcast join here measurably drags every
    // downstream pass (the joined array column rides along row-wise)
    val bktExpr = stat.map { r =>
      (r.getString(0), typedLit(r.getSeq[Double](2)))
    }.foldLeft(lit(null).cast("int")) { case (acc, (gk, bsLit)) =>
      when($"g" === gk, size(filter(bsLit, b => $"v" > b))).otherwise(acc)
    }
    val bucketed = g.select($"g", $"v", bktExpr.as("bkt"))

    // pass 2: exact (group, bucket) counts — ≤ groups × nBuckets rows
    val cnts = bucketed.groupBy($"g", $"bkt").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val cntsByG = cnts.groupBy(_._1).map { case (gk, rows) =>
      gk -> rows.map(t => (t._2, t._3)).sortBy(_._1)
    }

    def qpos(q: Double, n: Long): Double = q * (n - 1).toDouble
    // wanted 1-based global ranks per group, then per (group, bucket)
    // local ranks via the exact prefix offsets
    val wanted: Map[String, Map[Int, Seq[Long]]] = nByG.map { case (gk, n) =>
      val ranks = qs.flatMap { q =>
        val p = qpos(q, n)
        Seq(math.floor(p).toLong + 1, math.ceil(p).toLong + 1)
      }.distinct
      val cells = cntsByG(gk)
      val off = scala.collection.mutable.Map.empty[Int, Long]
      var run = 0L
      cells.foreach { case (bk, c) => off(bk) = run; run += c }
      val byBkt = ranks.map { r =>
        val bk = cells.map(_._1).filter(b => off(b) < r).last
        bk -> (r - off(bk))
      }.groupBy(_._1).map { case (bk, v) => bk -> v.map(_._2).distinct }
      gk -> byBkt
    }
    val offByG: Map[String, Map[Int, Long]] = cntsByG.map { case (gk, cells) =>
      var run = 0L
      gk -> cells.map { case (bk, c) => val o = run; run += c; bk -> o }.toMap
    }

    // pass 3: sort ONLY the wanted buckets, fetch the wanted local
    // ranks (bounded collect: ≤ 2·|qs| rows per group)
    val W = org.apache.spark.sql.expressions.Window
    val bktFilter = wanted.toSeq.flatMap { case (gk, m) =>
      m.keys.map(bk => $"g" === gk && $"bkt" === bk)
    }.reduce(_ || _)
    val lrFilter = wanted.toSeq.flatMap { case (gk, m) =>
      m.toSeq.map { case (bk, lrs) =>
        $"g" === gk && $"bkt" === bk && $"lr".isin(lrs: _*)
      }
    }.reduce(_ || _)
    val atRank = bucketed.filter(bktFilter)
      .withColumn("lr",
        row_number().over(W.partitionBy($"g", $"bkt").orderBy($"v")))
      .filter(lrFilter)
      .select($"g", $"bkt", $"lr", $"v")
      .as[(String, Int, Long, Double)].collect()
      .map { case (gk, bk, lr, v) => (gk, lr + offByG(gk)(bk)) -> v }.toMap

    nByG.map { case (gk, n) =>
      val vals = qs.map(q => interpolate(p = qpos(q, n), n = n,
        at = r => atRank((gk, r))))
      gk -> (n, vals)
    }
  }

  /** The Percentile aggregate's linear interpolation, operation-order
    * AND branch exact: hi = ⌈pos⌉, early return on integer pos and on
    * tied endpoint values, else (hi − pos)·v_lo + (pos − lo)·v_hi.
    * Neither the algebraically equal v_lo + frac·(v_hi − v_lo) nor
    * skipping the tie branch is safe: both differ by an ulp on ~half
    * of inputs ((hi−pos)+(pos−lo) itself rounds away from 1.0), which
    * would flip floor-rounded outputs at exact boundaries. `at`
    * fetches the 1-based order statistic.
    */
  private[ops] def interpolate(p: Double, n: Long,
                               at: Long => Double): Double = {
    val lo = math.floor(p).toLong
    val hi = math.ceil(p).toLong
    val vlo = at(lo + 1)
    if (hi == lo) return vlo
    val vhi = at(hi + 1)
    if (vhi == vlo) vlo
    else (hi - p) * vlo + (p - lo) * vhi
  }
}
