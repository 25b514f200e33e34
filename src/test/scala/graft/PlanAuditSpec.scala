package graft

/** Whole-catalog plan gate: every `SparkEntry.queries` entry must plan
  * cleanly. A lost `broadcast()` hint turns a query×corpus crossJoin into
  * a CartesianProduct — the one operator that is NEVER acceptable at
  * corpus scale (it materializes |left|×|right| rows with no pruning).
  * The headline queries get detailed shape gates in PlanSpec/IvfSpec;
  * this sweep catches regressions in the other ~50.
  */
class PlanAuditSpec extends SparkSuite {

  // Caveat: operators that eagerly materialize a subtree at construction
  // (the dedup pair tables, the IVF index builds) surface here only as
  // LogicalRDD scans — their internal join shapes are gated where they
  // are visible (DedupSpec's degenerate-bucket test, IvfSpec's plan
  // gates); this sweep covers everything downstream of the barriers.
  test("no checked query plans a CartesianProduct") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = planOf(fn(spark, sfDir))
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
    }
  }
}
