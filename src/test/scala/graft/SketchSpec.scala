package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Error-bound gates for the approximate sketches (estimates are not
  * cross-engine oracle-comparable by design — these specs bound them
  * against exact answers instead, the same gate style as streaming).
  */
class SketchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("approx_count_distinct lands within its configured rsd of the exact count") {
    val orders = Tables.orders(spark, sf)
    val exact = orders.select(countDistinct($"o_custkey")).head().getLong(0)
    val rsd = 0.02
    val est = Sketches.approxDistinct(orders, "o_custkey", rsd)
    // 5 sigma of slack on a 2% rsd — flake-proof but still tight
    assert(math.abs(est - exact).toDouble / exact <= 5 * rsd,
      s"HLL estimate $est vs exact $exact exceeds ${5 * rsd}")
  }

  test("bloom prefilter: members never drop, pass-through volume is bounded, join result identical") {
    val orders = Tables.orders(spark, sf)
    // the "small" side: customers with any high-priority order
    val keys = orders.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").distinct()
    val nKeys = keys.count()
    val bloom = Sketches.bloomOf(keys, "o_custkey", nKeys, 0.03)

    val pre = Sketches.bloomPrefilter(orders, "o_custkey", bloom)
    // no false negatives: the exact join over the prefiltered side
    // equals the exact join over the raw side
    val joined = pre.join(keys, "o_custkey").select($"o_orderkey")
    val expected = orders.join(keys, "o_custkey").select($"o_orderkey")
    assert(joined.except(expected).isEmpty && expected.except(joined).isEmpty,
      "bloom prefilter changed the join result")

    // volume bound: survivors <= matches + ~fpp * non-matches (5x slack)
    val matches = expected.count()
    val nonMatches = orders.count() - matches
    val survivors = pre.count()
    assert(survivors >= matches, "a member row was dropped")
    assert(survivors - matches <= math.max(50, (5 * 0.03 * nonMatches).toLong),
      s"bloom passed ${survivors - matches} of $nonMatches non-matches at fpp 0.03")
  }

  test("count-min sketch never undercounts and overcounts within eps * N") {
    val docs = Tables.documents(spark, sf)
    val eps = 0.01
    val cms = Sketches.countMinOf(docs, "lang", eps, confidence = 0.99)
    val exact = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    for ((lang, cnt) <- exact) {
      val est = cms.estimateCount(lang)
      assert(est >= cnt, s"CMS undercounted $lang: $est < $cnt")
      assert(est - cnt <= (eps * n * 3).toLong + 1,
        s"CMS overcounted $lang: $est vs $cnt (N=$n)")
    }
  }
}
