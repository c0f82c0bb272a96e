package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Structural guard against the round-12 failure mode: a query def
  * fully written in the queries sources — operator, oracle SQL, specs —
  * but never added to its module's `all` list, so the driver's
  * correctness gate silently never runs it (q189–q192 shipped that way;
  * nothing anywhere was red). Two invariants make that impossible now:
  *
  *  1. every `private def qNNN(` in the queries sources has a matching
  *     `QueryDef` in [[SparkEntry.registry]] (a source scan of the queries source dir, so a def
  *     the compiler can't see as unused — they're all referenced by
  *     their Sql vals' proximity, not the registry — still gets
  *     caught);
  *  2. the registry is DENSE q01..qMAX with unique names and unique
  *     numbers — a hole means a number was claimed in review docs but
  *     never shipped, or a def was deleted without renumbering intent
  *     being recorded.
  */
class RegistryCompletenessSpec extends AnyFunSuite {

  private val nameNum = """^q(\d+)_""".r

  private def registeredNumbers: Seq[Int] =
    SparkEntry.registry.map(_.name).map { n =>
      nameNum.findFirstMatchIn(n)
        .getOrElse(fail(s"registry name without qNNN_ prefix: $n"))
        .group(1).toInt
    }

  private def queriesDir: Path = {
    val p = Paths.get("src", "main", "scala", "graft", "queries")
    assert(Files.isDirectory(p),
      s"queries source dir not found from ${Paths.get("").toAbsolutePath}")
    p
  }

  test("every written query def is registered (no silent absence)") {
    val defPattern = """private def q(\d+)\(""".r
    val written = Files.list(queriesDir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val src = new String(Files.readAllBytes(p), "UTF-8")
        defPattern.findAllMatchIn(src).map(_.group(1).toInt)
      }
      .toSet
    val registered = registeredNumbers.toSet
    val unregistered = (written -- registered).toSeq.sorted
    assert(unregistered.isEmpty,
      "query defs written in queries/*.scala but absent from " +
        s"SparkEntry.registry: ${unregistered.map(n => f"q$n%03d").mkString(", ")}")
    val phantom = (registered -- written).toSeq.sorted
    assert(phantom.isEmpty,
      s"registry entries with no source def: ${phantom.mkString(", ")}")
  }

  test("registry is dense q01..qMAX with unique names and numbers") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate registry names: ${names.diff(names.distinct).mkString(", ")}")
    val nums = registeredNumbers
    assert(nums.distinct.size == nums.size,
      s"duplicate query numbers: ${nums.diff(nums.distinct).mkString(", ")}")
    val missing = (1 to nums.max).filterNot(nums.toSet)
    assert(missing.isEmpty, s"registry holes: ${missing.mkString(", ")}")
  }

  test("every registered query with an oracle has a non-empty SQL string") {
    SparkEntry.registry.foreach { q =>
      q.oracle.foreach(sql =>
        assert(sql.trim.nonEmpty, s"${q.name}: empty oracle SQL"))
    }
  }
}
