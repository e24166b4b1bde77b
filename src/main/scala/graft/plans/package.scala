package graft

/** Custom logical/physical plans — deliberately empty.
  *
  * SURVEY §4's conclusion holds after implementation: every operator in
  * the reference's surface (and the LLM-pipeline extensions) is
  * expressible as either built-in Catalyst plans or custom scalar/
  * aggregate *expressions* ([[graft.functions]]), which keep whole-stage
  * codegen and the optimizer's pushdown/pruning/reorder intact. The one
  * operator Spark lacks wholesale — the as-of join — composes from a
  * union + window ([[graft.operators.AsOfJoin]]) with the same single
  * shuffle a dedicated `SparkPlan` would need, so a custom
  * `LogicalPlan`/`SparkStrategy` pair would add surface without adding
  * capability or speed. This package exists to record that decision;
  * revisit if a future operator genuinely needs whole-operator
  * semantics (e.g. a native range-join with interval partitioning).
  */
package object plans
