package graft.ops

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the histogram-quantile relation: on random data
  * (including gapped, two-cluster distributions designed to trip the
  * empty-bin straddle case) the exact column matches a sort-and-
  * interpolate reference, the dense-bin one-bin-width contract holds
  * whenever the target rank's bracketing order statistics share a
  * bin, and the `within_bound` column reports |err| ≤ w truthfully
  * either way.  Fixed seeds → reproducible. */
class HistQuantilesPropertySpec extends SparkSuite {

  private val denseGen = Gen.listOfN(200, Gen.choose(0.0, 1000.0))
  // two far-apart clusters with a huge hole between them: quantiles
  // near the cluster boundary interpolate across many empty bins
  private val gappedGen = for {
    a <- Gen.listOfN(90, Gen.choose(0.0, 10.0))
    b <- Gen.listOfN(110, Gen.choose(100000.0, 100010.0))
  } yield a ++ b

  private def run(xs: Seq[Double]) = {
    import spark.implicits._
    xs.toDF("l_extendedprice").createOrReplaceTempView("lineitem")
    spark.sql(RelationalExt.histQuantilesSql(SparkDialect)).collect()
  }

  test("histogram quantiles: exactness, dense-bin bound, honest flag") {
    val cases =
      (1 to 5).map(i => denseGen(Gen.Parameters.default, Seed(i.toLong)).get) ++
      (1 to 5).map(i => gappedGen(Gen.Parameters.default, Seed(100L + i)).get)
    cases.foreach { xs =>
      val sorted = xs.sorted
      val n = sorted.length
      val (lo, hi) = (sorted.head, sorted.last)
      val w = (hi - lo) / 128.0
      run(xs).foreach { r =>
        val p = r.getAs[Double]("p")
        // 1. the exact column is a plain sort-interpolate
        val rank = p * (n - 1)
        val (i, f) = (rank.toInt, rank - rank.toInt)
        val exact = if (i + 1 < n) sorted(i) + f * (sorted(i + 1) - sorted(i))
                    else sorted(i)
        assert(math.abs(r.getAs[Double]("exact") - exact) < 1e-4 + 1e-9 * math.abs(exact),
          s"p=$p exact=${r.getAs[Double]("exact")} ref=$exact")
        // 2. the flag is truthful: within_bound == (|err| <= w) up to
        //    the relation's 4-decimal rounding of err and w
        val err = r.getAs[Double]("abs_err")
        val wCol = r.getAs[Double]("bin_width")
        if (math.abs(err - wCol) > 1e-3) // away from the rounding edge
          assert(r.getAs[Boolean]("within_bound") == (err <= wCol),
            s"p=$p err=$err w=$wCol flag=${r.getAs[Boolean]("within_bound")}")
        // 3. dense-bin contract: when the bracketing order stats land
        //    in the same bin, the estimate is within one bin width
        def bin(x: Double): Long =
          math.min(math.floor((x - lo) / w).toLong, 127L)
        val sameBin = i + 1 >= n || bin(sorted(i)) == bin(sorted(i + 1))
        if (sameBin)
          assert(err <= wCol + 1e-4,
            s"dense case violated: p=$p err=$err w=$wCol")
      }
    }
  }

  test("degenerate all-equal column: explicit bin-0 guard, exact answer") {
    // hi = lo would make the bin divisor 0/0 = NaN without the guard;
    // the relation must answer the (well-defined) constant quantile
    // exactly, with bin width 0 and the bound flag true
    run(Seq.fill(50)(42.5)).foreach { r =>
      assert(r.getAs[Double]("est") == 42.5, s"est=${r.getAs[Double]("est")}")
      assert(r.getAs[Double]("exact") == 42.5)
      assert(r.getAs[Double]("abs_err") == 0.0)
      assert(r.getAs[Double]("bin_width") == 0.0)
      assert(r.getAs[Boolean]("within_bound"))
    }
  }
}
