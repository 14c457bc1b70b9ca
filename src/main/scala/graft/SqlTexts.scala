package graft

/** SQL statements shared VERBATIM between the engine (`spark.sql`) and the
  * DuckDB oracle — the dialect-shared subset is itself the correctness
  * argument: one text, two engines, hash-equal results.
  */
object SqlTexts {

  /** Recursive CTE: binary-ancestor chain (parent = key div 2, spelled as
    * CAST(floor(x / 2)) because bare integer `/` differs between dialects).
    * Bounded: halving any key reaches 1.
    */
  val recursiveChain: String =
    """WITH RECURSIVE anc(c_custkey, anc_key, depth) AS (
      |  SELECT c_custkey, c_custkey, 0 AS depth FROM customer WHERE c_custkey <= 100
      |  UNION ALL
      |  SELECT a.c_custkey, CAST(floor(a.anc_key / 2) AS BIGINT), a.depth + 1
      |  FROM anc a WHERE a.anc_key > 1)
      |SELECT c_custkey, max(depth) AS depth_to_root, count(*) AS chain_len
      |FROM anc GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  /** Correlated LATERAL subquery: top-2 orders per customer — the
    * "per-row dependent subquery" surface (Spark plans it as a rewritten
    * lateral join, DuckDB as a dependent join). Full tie-break so the
    * LIMIT inside the lateral is deterministic on both engines.
    */
  val lateralTop2: String =
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c_custkey <= 200
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin
}
