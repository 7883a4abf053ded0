package graft

import graft.sources.SqlServerWriter
import SqlServerWriter._

class SqlServerWriterSpec extends SparkSpec {
  import spark.implicits._

  private class RecordingExecutor(mergeCounts: Seq[Any] = Seq(2L, 1L, 0L),
                                  targetRows: Long = 5L) extends SqlExecutor {
    val statements = scala.collection.mutable.ArrayBuffer.empty[String]
    override def execute(sql: String): Seq[Seq[Any]] = {
      statements += sql
      if (sql.startsWith("SELECT COUNT(*)")) Seq(Seq(targetRows))
      else if (sql.contains("MERGE ")) Seq(mergeCounts)
      else Nil
    }
  }

  test("buildMergeSql emits the reference T-SQL shape") {
    val sql = buildMergeSql("dbo.customers", "staging.customers_staging",
      Seq("id"), Seq("id", "name", "balance", "created_at", "updated_at"),
      MergeOptions(
        updateCondition = Some("source.[balance] <> target.[balance]"),
        auditCols = AuditCols(Some("created_at"), Some("updated_at"))))
    assert(sql.contains("MERGE [dbo].[customers] AS target"))
    assert(sql.contains("USING [staging].[customers_staging] AS source"))
    assert(sql.contains("ON target.[id] = source.[id]"))
    assert(sql.contains("WHEN MATCHED AND source.[balance] <> target.[balance] THEN"))
    // audit: updated_at set server-side, created_at never updated
    assert(sql.contains("[updated_at] = GETUTCDATE()"))
    assert(!sql.contains("[created_at] = source.[created_at]"))
    assert(sql.contains("INSERT ([id], [name], [balance], [created_at], [updated_at])"))
    assert(sql.contains("VALUES (source.[id], source.[name], source.[balance], GETUTCDATE(), GETUTCDATE())"))
    assert(sql.contains("OUTPUT $action INTO @MergeActions;"))
    assert(sql.contains("WHEN NOT MATCHED BY TARGET THEN"))
    // delete condition adds a DELETE branch
    val withDelete = buildMergeSql("t", "s", Seq("id"), Seq("id", "v"),
      MergeOptions(deleteCondition = Some("source.[v] IS NULL")))
    assert(withDelete.contains("WHEN MATCHED AND source.[v] IS NULL THEN\n    DELETE"))
  }

  test("merge flow: validate, stage, MERGE, drop staging; counts returned") {
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "name")
    val ex = new RecordingExecutor()
    var staged: Option[String] = None
    val result = merge(df, "dbo.target", Seq("id"), ex,
      stage = (_, table) => staged = Some(table))
    assert(staged.contains("staging.target_staging"))
    assert(result == MergeResult(inserted = 2, updated = 1, deleted = 0))
    assert(result.totalAffected == 3)
    val kinds = ex.statements.map(_.takeWhile(_ != ' '))
    assert(kinds == Seq("SELECT", "DECLARE", "DROP")) // count, merge, cleanup
  }

  test("empty target uses INSERT...SELECT fast path; staging always dropped") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
    val ex = new RecordingExecutor(targetRows = 0L)
    val result = merge(df, "dbo.t2", Seq("id"), ex, stage = (_, _) => ())
    assert(result == MergeResult(inserted = 2))
    assert(ex.statements.exists(_.startsWith("INSERT INTO [dbo].[t2]")))
    assert(!ex.statements.exists(_.contains("MERGE ")))
    assert(ex.statements.last.startsWith("DROP TABLE IF EXISTS"))
  }

  test("key validation rejects null and duplicate merge keys before staging") {
    val ex = new RecordingExecutor()
    val withNull = Seq((Some(1), "a"), (None, "b")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      merge(withNull, "dbo.t", Seq("id"), ex, stage = (_, _) => fail("must not stage"))
    }
    val withDup = Seq((1, "a"), (1, "b")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      merge(withDup, "dbo.t", Seq("id"), ex, stage = (_, _) => fail("must not stage"))
    }
    assert(validateKeys(withDup, Seq("id")) == ValidationResult(false, 0, 1))
  }

  test("overwrite strategies: truncate_insert and delete_insert") {
    val df = Seq((1, "a")).toDF("id", "name")
    val ex1 = new RecordingExecutor()
    assert(overwrite(df, "dbo.t", ex1, (_, _) => (), "truncate_insert") == 1L)
    assert(ex1.statements.head.startsWith("TRUNCATE TABLE [dbo].[t]"))
    val ex2 = new RecordingExecutor()
    overwrite(df, "dbo.t", ex2, (_, _) => (), "delete_insert")
    assert(ex2.statements.head.startsWith("DELETE FROM [dbo].[t]"))
    intercept[IllegalArgumentException] {
      overwrite(df, "dbo.t", new RecordingExecutor(), (_, _) => (), "nope")
    }
  }
}
