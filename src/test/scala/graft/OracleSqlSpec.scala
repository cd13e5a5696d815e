package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint over the assembled oracle-SQL map — pure string checks, no
  * SparkSession. The backslash rule exists because the map mixes plain
  * triple-quoted strings (write `\s+` as-is) with s-interpolated ones
  * (processEscapes collapses `\\s+` to `\s+`): moving an oracle between
  * the two kinds silently doubles or halves its backslashes, and the
  * breakage would otherwise surface only at driver gate time. No oracle in
  * this corpus legitimately regex-matches a literal backslash, so a
  * surviving `\\` in the RUNTIME string is always a mis-escape. */
class OracleSqlSpec extends AnyFunSuite {

  test("no assembled oracle SQL carries a literal double backslash") {
    val bad = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("\\\\") => name
    }
    assert(bad.isEmpty,
      s"mis-escaped oracle SQL (literal \\\\ in runtime string): " +
        bad.toSeq.sorted.mkString(", "))
  }

  test("oracle keys and query keys line up (no dangling or missing names)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    // 100% oracle coverage is a reached invariant (203/203 in r14): a query
    // without an oracle only gets the driver's weaker rows-only check, so
    // regressing coverage must be a conscious edit here, not an oversight.
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
  }
}
