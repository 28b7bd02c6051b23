package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: collapse duplicated EXPENSIVE subexpressions inside a
  * single Filter predicate into one evaluation per row.
  *
  * Why this exists: `PushPredicateThroughNonJoin` inlines projection
  * aliases into pushed filters with NO cost guard. A predicate over an
  * aliased `from_json(...)` struct re-parses the JSON once per referenced
  * field (measured 9×/row on q33: 20.6 s), an aliased md5-derived bucket
  * re-digests once per hex substring (8×/row on q99: 2× wall), and a
  * variant field probe re-built the variant 6×/row (q80). The repo's
  * query-level fix is the explode-Generate barrier; THIS rule is the
  * engine-level fix. It rewrites
  *
  *     Filter(f(e, e, …, e), child)
  *  →  Project(child.output,
  *       Filter(f(a, a, …, a),
  *         Project(child.output :+ (e AS a), child)))
  *
  * with the shared evaluation carried by a single-row explode GENERATE —
  * the same barrier the hand-tuned queries use (q33/q53/q80) — because a
  * plain Project alias would be re-inlined: `PushDownPredicates` runs
  * again in the PartitionPruning and Python-UDF batches (33/35), both
  * AFTER every injection point, and pushdown cannot cross a Generate
  * whose output the predicate references. (`With` can't be used either:
  * its rewrite batch runs FIRST in the optimizer, long before pushdown
  * manufactures the duplication.)
  *
  * Injection point: `injectPreCBORule`, after the operator-optimization
  * fixed point. Nothing is lost at the scan: digest/parse/regex
  * predicates never translate into data-source PushedFilters, so they
  * were always evaluated post-scan anyway.
  *
  * Semantics-preserving: only deterministic subtrees are deduplicated and
  * nothing moves across the Filter boundary. Idempotent: rewritten
  * filters reference the marker alias and are skipped on re-entry.
  */
object DedupExpensiveFilter extends Rule[LogicalPlan] {

  private val Marker = "_graft_cse"

  /** Expression families worth one-per-row treatment: full-input digests,
    * JSON/variant parses, regex engines. */
  private def isExpensive(e: Expression): Boolean = e match {
    case _: Md5 | _: Sha1 | _: Sha2 | _: Crc32 | _: Murmur3Hash | _: XxHash64 => true
    case _: JsonToStructs | _: GetJsonObject | _: JsonTuple => true
    case _: RegExpExtract | _: RegExpExtractAll | _: RegExpReplace | _: RLike => true
    case s: objects.StaticInvoke => s.functionName == "parseJson" // VARIANT build
    case _ => false
  }

  /** Top-most expensive subtrees (no descent into a matched subtree). */
  private def expensiveSubtrees(cond: Expression): Seq[Expression] = {
    val out = scala.collection.mutable.ArrayBuffer[Expression]()
    def visit(e: Expression): Unit =
      if (isExpensive(e)) out += e else e.children.foreach(visit)
    visit(cond)
    out.toSeq
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child)
        if !cond.references.exists(_.name.startsWith(Marker)) =>
      val dups = expensiveSubtrees(cond)
        .filter(_.deterministic)
        .groupBy(_.canonicalized)
        .values.filter(_.size > 1).map(_.head).toSeq
      if (dups.isEmpty) f
      else {
        // one struct carrying every deduped value, exploded from a
        // single-element array: one evaluation per input row
        val payload = CreateNamedStruct(dups.zipWithIndex.flatMap {
          case (d, i) => Seq(Literal(s"c$i"), d)
        })
        val attr = AttributeReference(Marker, payload.dataType, nullable = false)()
        val gen = org.apache.spark.sql.catalyst.plans.logical.Generate(
          Explode(CreateArray(Seq(payload))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(attr), child = child)
        val newCond = dups.zipWithIndex.foldLeft(cond) { case (c, (d, i)) =>
          c.transform {
            case e: Expression if e.semanticEquals(d) =>
              GetStructField(attr, i, Some(s"c$i"))
          }
        }
        Project(f.output, Filter(newCond, gen))
      }
  }
}
