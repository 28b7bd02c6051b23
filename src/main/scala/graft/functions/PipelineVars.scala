package graft.functions

/** Typed project configuration — the reference's `var()` surface
  * (reference dbt_project.yml:12-14: vat_rate 0.05, monthly_discount_rate
  * 0.009 — the latter declared but referenced by no model; kept for API
  * completeness). Queries take the config as a value instead of reading
  * global state, so a cluster job can inject per-run overrides. */
final case class PipelineVars(
    vatRate: Double = 0.05,
    monthlyDiscountRate: Double = 0.009)

object PipelineVars {
  val default: PipelineVars = PipelineVars()
}
