package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static hygiene over the registered query surface — rules that hold for
  * every CURRENT and FUTURE oracle, enforced without a Spark session.
  */
class RepoHygieneSpec extends AnyFunSuite {

  test("no bare \\s in oracle SQL: whitespace must be an explicit class") {
    // Java \s includes vertical tab \x0B, RE2's (DuckDB) does not — a bare
    // \s in a dual-dialect tokenizer diverges on any document containing a
    // VT. Every shared pattern spells the class out (TextFunctions.Ws).
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("\\s") => name
    }
    assert(offenders.isEmpty,
      s"bare \\s in oracle SQL (Java-vs-RE2 VT divergence): ${offenders.mkString(", ")}")
  }

  test("no double-backslash escapes in oracle SQL string values") {
    // DuckDB standard-conforming strings do NOT process backslash escapes:
    // a regex must arrive with single backslashes. A doubled backslash in
    // the final SQL text means an s-interpolation layer was miscounted and
    // the pattern matches a literal backslash instead.
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("\\\\") => name
    }
    assert(offenders.isEmpty,
      s"double backslash reached final SQL text: ${offenders.mkString(", ")}")
  }

  test("spark-side whitespace class matches the oracle-side text") {
    // one definition, two dialects: the Spark pattern constant must be the
    // exact text the oracle SQL inlines
    assert(graft.functions.TextFunctions.Ws == "[ \\t\\n\\x0B\\f\\r]")
  }
}
