package graft.sql

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Compatibility sweep over the reference's OWN shipped demo
  * applications (/root/reference/demo: quickstart, trading apps, 1brc,
  * test-harness tiers): every header-bearing .sql file must parse as a
  * SqlApp and every statement inside every file must parse through
  * VeloSqlParser — the "a velostream user can bring their apps here
  * unchanged" proof. */
class DemoAppsSpec extends AnyFunSuite {

  private val demoDir = Paths.get("/root/reference/demo")

  private lazy val files =
    if (Files.exists(demoDir))
      Files.walk(demoDir).iterator().asScala
        .filter(_.toString.endsWith(".sql")).toVector.sortBy(_.toString)
    else Vector.empty

  test("every reference demo .sql parses: apps via SqlApp, statements via VeloSqlParser") {
    assume(files.nonEmpty, "reference demo dir absent")
    var stmts = 0
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    files.foreach { f =>
      val content = Files.readString(f)
      val hasHeader = content.linesIterator.exists(_.trim.startsWith("-- SQL Application:"))
      val statements: Seq[String] =
        if (hasHeader)
          try SqlApp.parse(content, _ => None).statements.map(_.sql)
          catch { case e: Throwable => failures += s"${f.getFileName}: app parse: ${e.getMessage}"; Nil }
        else VeloContext.splitStatements(content)
      statements.foreach { s =>
        stmts += 1
        try VeloSqlParser.parse(s)
        catch { case e: Throwable =>
          failures += s"${f.getFileName}: ${e.getMessage.take(80)}" }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    assert(stmts >= 30, s"only $stmts statements swept") // the demo corpus is non-trivial
  }

  test("every reference examples/*.sql parses too (the non-demo app corpus)") {
    val exDir = Paths.get("/root/reference/examples")
    assume(Files.exists(exDir), "reference examples dir absent")
    val exFiles = Files.walk(exDir).iterator().asScala
      .filter(_.toString.endsWith(".sql")).toVector.sortBy(_.toString)
      // test_parsing_error.sql is the reference's own INVALID-SQL fixture
      .filterNot(_.getFileName.toString == "test_parsing_error.sql")
    var stmts = 0
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    exFiles.foreach { f =>
      val content = Files.readString(f)
      val hasHeader = content.linesIterator.exists(_.trim.startsWith("-- SQL Application:"))
      val statements: Seq[String] =
        if (hasHeader)
          try SqlApp.parse(content, _ => None).statements.map(_.sql)
          catch { case e: Throwable => failures += s"${f.getFileName}: app parse: ${e.getMessage}"; Nil }
        else VeloContext.splitStatements(content)
      statements.foreach { s =>
        stmts += 1
        try VeloSqlParser.parse(s)
        catch { case e: Throwable =>
          failures += s"${f.getFileName}: ${e.getMessage.take(100)} || ${s.linesIterator.mkString(" ").take(120)}" }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    assert(stmts >= 10, s"only $stmts statements swept")
  }

  test("the trading market-data app's metadata round-trips (annotations + env defaults)") {
    val f = demoDir.resolve("trading/apps/app_market_data.sql")
    assume(Files.exists(f))
    val app = SqlApp.parse(Files.readString(f), _ => None)
    val m = app.metadata
    assert(m.name.nonEmpty)
    assert(m.deploymentNodeId.contains("market_data-1"))   // ${POD_NAME:market_data-1} default
    assert(m.deploymentRegion.contains("us-east-1"))       // ${AWS_REGION:us-east-1} default
    assert(m.observabilityProfiling.contains("prod"))
    assert(m.extra.contains("job_mode") || m.extra.contains("batch_size"))
    assert(app.statements.nonEmpty)
  }
}
