package graft

import org.scalatest.funsuite.AnyFunSuite

/** Data-driven YAML test runner (reference: odibi/cli/test.py). */
class TestCliSpec extends AnyFunSuite with SparkSpec {

  private def write(dir: java.nio.file.Path, name: String, text: String): java.nio.file.Path = {
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve(name), text)
  }

  private def tmpDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-testcli")

  test("passing transform and sql cases exit 0") {
    val dir = tmpDir()
    write(dir, "orders_test.yaml",
      """tests:
        |  - name: keeps positive amounts
        |    transform: filter_rows
        |    params: { condition: "amount > 0" }
        |    inputs:
        |      df:
        |        - { id: 1, amount: 10.5 }
        |        - { id: 2, amount: -3 }
        |        - { id: 3, amount: 2 }
        |    expected:
        |      - { id: 1, amount: 10.5 }
        |      - { id: 3, amount: 2 }
        |  - name: sql aggregation over named inputs
        |    sql: |
        |      SELECT region, count(*) AS n FROM df GROUP BY region
        |    inputs:
        |      df:
        |        - { region: EU, id: 1 }
        |        - { region: EU, id: 2 }
        |        - { region: US, id: 3 }
        |    expected:
        |      - { region: EU, n: 2 }
        |      - { region: US, n: 1 }
        |""".stripMargin)
    assert(Test.mainExit(Array(dir.toString)) === 0)
  }

  test("a failing case exits 1 and reports the diff") {
    val dir = tmpDir()
    write(dir, "bad_test.yaml",
      """tests:
        |  - name: wrong expectation
        |    transform: filter_rows
        |    params: { condition: "amount > 0" }
        |    inputs:
        |      df: [ { id: 1, amount: 10 } ]
        |    expected: [ { id: 1, amount: 999 } ]
        |""".stripMargin)
    assert(Test.mainExit(Array(dir.toString)) === 1)
  }

  test("comparison is column-order- and dtype-insensitive") {
    val dir = tmpDir()
    write(dir, "lax_test.yaml",
      """tests:
        |  - name: int vs double vs string-number all agree
        |    transform: derive_columns
        |    params: { derivations: { doubled: "amount * 2" } }
        |    inputs:
        |      df: [ { id: 1, amount: 5 } ]
        |    expected:
        |      - { doubled: "10.0", amount: 5.0, id: "1" }
        |""".stripMargin)
    assert(Test.mainExit(Array(dir.toString)) === 1 - 1)
  }

  test("unknown transform fails with registry hint") {
    val dir = tmpDir()
    write(dir, "missing_test.yaml",
      """tests:
        |  - name: nope
        |    transform: does_not_exist
        |    inputs: { df: [ { a: 1 } ] }
        |    expected: [ { a: 1 } ]
        |""".stripMargin)
    assert(Test.mainExit(Array(dir.toString)) === 1)
  }

  test("--snapshot writes the expected CSV, then a plain run passes from it") {
    val dir = tmpDir()
    val yaml =
      """tests:
        |  - name: Snap Case
        |    sql: SELECT id, upper(name) AS big FROM df
        |    inputs:
        |      df:
        |        - { id: 1, name: "a,b" }
        |        - { id: 2, name: null }
        |""".stripMargin
    write(dir, "snap_test.yaml", yaml)
    assert(Test.mainExit(Array(dir.toString, "--snapshot")) === 0)
    val snap = dir.resolve("__snapshots__/snap_test/snap-case.csv")
    assert(java.nio.file.Files.exists(snap))
    // no 'expected' in the YAML — the stored snapshot is the oracle now
    assert(Test.mainExit(Array(dir.toString)) === 0)
  }

  test("missing expected without snapshot fails with guidance") {
    val dir = tmpDir()
    write(dir, "nosnap_test.yaml",
      """tests:
        |  - name: unsnapped
        |    sql: SELECT 1 AS one FROM df
        |    inputs: { df: [ { x: 1 } ] }
        |""".stripMargin)
    assert(Test.mainExit(Array(dir.toString)) === 1)
  }

  test("multi-input transform reaches context datasets") {
    val dir = tmpDir()
    write(dir, "join_test.yaml",
      """tests:
        |  - name: sql joins two inputs
        |    sql: |
        |      SELECT o.id, c.name FROM df o JOIN customers c ON o.cust = c.cid
        |    inputs:
        |      df: [ { id: 1, cust: 10 }, { id: 2, cust: 11 } ]
        |      customers: [ { cid: 10, name: alice }, { cid: 11, name: bob } ]
        |    expected:
        |      - { id: 1, name: alice }
        |      - { id: 2, name: bob }
        |""".stripMargin)
    assert(Test.mainExit(Array(dir.toString)) === 0)
  }

  test("discovery matches *test*.yaml and test_*.yml, skips snapshots dir") {
    val dir = tmpDir()
    write(dir, "alpha_test.yaml", "tests: []\n")
    write(dir, "test_beta.yml", "tests: []\n")
    write(dir, "notes.yaml", "tests: []\n")
    write(dir.resolve("__snapshots__"), "inner_test.yaml", "tests: []\n")
    val found = Test.discover(dir).map(_.getFileName.toString)
    assert(found === Seq("alpha_test.yaml", "test_beta.yml"))
  }

  test("malformed YAML reports a load failure, exit 1") {
    val dir = tmpDir()
    write(dir, "broken_test.yaml", "tests: [ { name: x, transform: ] oops\n")
    assert(Test.mainExit(Array(dir.toString)) === 1)
  }

  test("usage errors exit 2; empty dir warns and exits 0") {
    assert(Test.mainExit(Array.empty) === 2)
    assert(Test.mainExit(Array("/nonexistent/path/xyz")) === 2)
    assert(Test.mainExit(Array(tmpDir().toString)) === 0)
  }
}
