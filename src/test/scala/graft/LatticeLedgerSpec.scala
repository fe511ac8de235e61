package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.LatticeLedger

/** The overflow-headroom ledger is ASSERTED, not advisory (r14 verdict
  * order #5): every registered long-typed lattice intermediate must
  * clear the ANSI long ceiling at the sf100 design point, and the
  * per-file DECIMAL(38,0) census must match the sources exactly — a
  * new lattice site fails here until it registers in the ledger. */
class LatticeLedgerSpec extends AnyFunSuite {

  test("every registered long-typed intermediate clears 2^63 at sf100") {
    val bad = LatticeLedger.sites.filterNot(_.worst < LatticeLedger.LongMax)
    assert(bad.isEmpty, bad.map(s =>
      f"${s.key} ${s.what}: ${s.worst}%.3g").mkString("; "))
  }

  test("no registered site runs thinner than 2x headroom at sf100") {
    // <2x means ordinary data drift (a price cap bump, a heavier skew)
    // could push it over between rounds — resize the lattice instead
    val thin = LatticeLedger.sites.filter(_.headroom < 2.0)
    assert(thin.isEmpty, thin.map(s =>
      f"${s.key}: headroom ${s.headroom}%.2fx (${s.what})").mkString("; "))
  }

  test("the DECIMAL(38,0) census matches the sources (new lattice " +
      "sites must register in the ledger)") {
    val base = java.nio.file.Paths.get("src/main/scala/graft")
    val actual = java.nio.file.Files.walk(base).iterator()
      .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    var counts = Map.empty[String, Int]
    actual.forEachRemaining { p =>
      if (p.toString.endsWith(".scala") &&
          !p.toString.endsWith("tools/LatticeLedger.scala")) {
        val n = "DECIMAL\\(38,0\\)".r
          .findAllIn(java.nio.file.Files.readString(p)).size
        if (n > 0)
          counts += base.relativize(p).toString -> n
      }
    }
    assert(counts == LatticeLedger.decimalCensus,
      s"census drift — update graft.tools.LatticeLedger (and audit " +
        s"the new site's long intermediates): actual=$counts " +
        s"ledger=${LatticeLedger.decimalCensus}")
  }
}
