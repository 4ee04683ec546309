package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, Join, JoinHint, LogicalPlan, BROADCAST}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Domain-knowledge broadcast planning as a Catalyst optimizer rule.
  *
  * Catalyst's own broadcast decision is SIZE-driven
  * (`autoBroadcastJoinThreshold` against plan statistics). At warehouse
  * scale that heuristic has a gap: a freshly DERIVED dimension (joins +
  * dedup + surrogate keys, nothing materialized) often carries no usable
  * size statistics, so its estimate is the product of its inputs and the
  * planner falls back to a shuffled join even though the engine KNOWS the
  * table is bounded (a product catalog, a salesperson roster — cardinality
  * fixed by the business domain, not the corpus).
  *
  * [[AutoBroadcastBoundedDims]] closes that gap declaratively: any join
  * side whose output carries a conf-listed marker column
  * (`graft.autobroadcast.cols`, default the bounded business keys of the
  * star's dim lookups) gets a BROADCAST hint injected, exactly as if the
  * query author had written `broadcast(dim)`. Corpus-growing dims
  * (cliente/localidade) are NOT listed — they must keep following the
  * size-driven path, which is the 100 TB contract (EngineSpec "corpus-sized
  * dims follow conf").
  *
  * Deployment: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * — no code change in queries; the rule is also injectable per-session in
  * tests. Idempotent: already-hinted sides are left untouched, so explicit
  * author hints always win.
  */
object AutoBroadcastBoundedDims extends Rule[LogicalPlan] {

  private val MarkerConf = "graft.autobroadcast.cols"
  private val DefaultMarkers = "id_produto_original,id_vendedor_original"
  private val MaxBytesConf = "graft.autobroadcast.maxBytes"
  private val DefaultMaxBytes = 256L * 1024 * 1024

  private def markers: Set[String] =
    SQLConf.get.getConfString(MarkerConf, DefaultMarkers)
      .split(",").map(_.trim).filter(_.nonEmpty).toSet

  private def maxBytes: Long =
    SQLConf.get.getConfString(MaxBytesConf, DefaultMaxBytes.toString).toLong

  /** Size guard (belt to the marker's suspenders): a marker-bearing side
    * whose statistics are CREDIBLE and huge is never force-broadcast. A
    * plan estimate is credible here when the subtree contains no Join —
    * scan/local-relation sizes are real numbers, while a join-derived
    * subtree's sizeInBytes is the product of its inputs (exactly the
    * garbage estimate this rule exists to bypass for derived dims). So:
    * join-free + over graft.autobroadcast.maxBytes (default 256 MB) →
    * refuse the hint; join-derived → trust the marker contract.
    */
  private def sizeGuardOk(p: LogicalPlan, limit: Long): Boolean = {
    val joinFree = p.collectFirst { case j: Join => j }.isEmpty
    !joinFree || p.stats.sizeInBytes <= BigInt(limit)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val m = markers
    val limit = maxBytes
    if (m.isEmpty) plan
    else plan.transform {
      case j @ Join(l, r, _, Some(cond), hint) =>
        // a side is "the bounded dim of THIS join" only when its marker
        // column is a key of THIS join's condition — merely carrying the
        // column is not enough (after the first lookup the ever-growing
        // fact side carries the dim's business key too, and hinting it
        // would broadcast the fact)
        val refs = cond.references
        def isBoundedLookup(p: LogicalPlan): Boolean =
          p.output.exists(a => m.contains(a.name) && refs.contains(a)) &&
            sizeGuardOk(p, limit)
        val lh = hint.leftHint.orElse(
          if (isBoundedLookup(l)) Some(HintInfo(strategy = Some(BROADCAST))) else None)
        val rh = hint.rightHint.orElse(
          if (isBoundedLookup(r)) Some(HintInfo(strategy = Some(BROADCAST))) else None)
        if (lh == hint.leftHint && rh == hint.rightHint) j
        else j.copy(hint = JoinHint(lh, rh))
    }
  }
}

/** `spark.sql.extensions` entry point registering the graft optimizer
  * rules AND the full native function set — the one-stop deployment
  * class (`--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * gives a session minhashes/cosine_sim/simhash64/… as builtins plus
  * the bounded-dim broadcast planning).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => AutoBroadcastBoundedDims)
    graft.functions.GraftFunctions.inject(e)
  }
}
