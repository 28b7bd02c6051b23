package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SortedFold

/** The factored secondary-sort group walk (round-9 verdict item 6):
  * boundary behavior is THE bug class the factoring exists to kill, so
  * the spec hits adjacency edges directly — single-element groups,
  * one group spanning the whole input, empty input, early-exit folds
  * (unread tails must not bleed into the next key), and scan resets at
  * every key change. Pure iterator logic — no Spark session needed.
  */
class SortedFoldSpec extends AnyFunSuite {

  test("foldGroups folds each adjacent key-group once, in order") {
    val rows = Seq(("a", 1), ("a", 2), ("b", 3), ("c", 4), ("c", 5), ("c", 6))
    val out = SortedFold.foldGroups(rows.iterator, (r: (String, Int)) => r._1) {
      (k, g) => (k, g.map(_._2).sum)
    }.toList
    assert(out == List(("a", 3), ("b", 3), ("c", 15)))
  }

  test("foldGroups: empty input, single-row groups, one whole-input group") {
    def run(rows: Seq[(Long, Long)]) =
      SortedFold.foldGroups(rows.iterator, (r: (Long, Long)) => r._1) {
        (k, g) => (k, g.size.toLong)
      }.toList
    assert(run(Nil) == Nil)
    assert(run(Seq((1L, 0L), (2L, 0L), (3L, 0L))) ==
      List((1L, 1L), (2L, 1L), (3L, 1L)))
    assert(run(Seq.fill(100)((7L, 0L))) == List((7L, 100L)))
  }

  test("foldGroups drains an early-exited group (no bleed into next key)") {
    val rows = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 9))
    val out = SortedFold.foldGroups(rows.iterator, (r: (String, Int)) => r._1) {
      (k, g) => (k, g.next()._2) // reads ONE row, abandons the rest
    }.toList
    assert(out == List(("a", 1), ("b", 9)))
  }

  test("foldGroups matches a groupBy oracle on a random duplicate-heavy key " +
    "sequence (sorted adjacency)") {
    val rng = new scala.util.Random(42)
    val rows = Vector.fill(2000)((rng.nextInt(37).toLong, rng.nextLong() % 1000))
      .sortBy(_._1)
    val got = SortedFold.foldGroups(rows.iterator, (r: (Long, Long)) => r._1) {
      (k, g) => k -> g.map(_._2).sum
    }.toMap
    val expect = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(got == expect)
  }

  test("scanGroups emits per row and reseeds state at every key change") {
    val rows = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0), ("b", 5.0))
    // running product per key, seeded 1.0
    val out = SortedFold.scanGroups(
      rows.iterator, (r: (String, Double)) => r._1, 1.0) {
      case (acc, (k, v)) => (acc * v, (k, acc * v))
    }.toList
    assert(out == List(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 12.0),
      ("b", 60.0)))
  }

  test("scanGroups: empty input and a key that repeats non-adjacently is " +
    "treated as two groups (adjacency contract, same as the hand-rolled walks)") {
    assert(SortedFold.scanGroups(
      Iterator.empty[(String, Int)], (r: (String, Int)) => r._1, 0) {
      case (acc, (k, v)) => (acc + v, acc + v)
    }.toList == Nil)
    val rows = Seq(("a", 1), ("b", 1), ("a", 1)) // NOT sorted: 'a' re-appears
    val out = SortedFold.scanGroups(
      rows.iterator, (r: (String, Int)) => r._1, 0) {
      case (acc, (_, v)) => (acc + v, acc + v)
    }.toList
    assert(out == List(1, 1, 1)) // second 'a' restarts — contract documented
  }
}
