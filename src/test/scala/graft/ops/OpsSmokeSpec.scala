package graft.ops

import graft.{SparkEntry, SparkSuite}

/** Every registered operator runs at sf0.001 and returns rows; oracle SQL
  * exists for every checked op. (Deep value-level correctness is the
  * driver's DuckDB gate — replicated in tools/check.py — this guards
  * against regressions that break an op entirely.) */
class OpsSmokeSpec extends SparkSuite {

  test("registry is consistent") {
    assert(SparkEntry.all.map(_.key).distinct.size == SparkEntry.all.size, "duplicate keys")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.all.foreach { op =>
    test(s"${op.key} returns rows at sf0.001") {
      assert(op.run(spark, sf0001).count() > 0, s"${op.key} returned 0 rows")
    }
  }
}
