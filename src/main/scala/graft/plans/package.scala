package graft

/** Custom Catalyst plans — intentionally EMPTY.
  *
  * The build brief's preference order for operators Spark lacks is:
  * (a) compose built-ins, (b) custom `Expression`, (c) custom
  * `LogicalPlan`+`Rule`+`SparkStrategy`+`SparkPlan`, (d) `mapPartitions`.
  *
  * Every operator in this engine — the reference's full inventory
  * (SURVEY.md §2) and the training-data extensions — lands on (a), with two
  * deliberate exceptions one step down the ladder:
  *
  *  - `graft.functions.TopKAgg`: a typed `Aggregator` (the sanctioned
  *    custom-aggregation surface) where built-ins cost O(group) memory;
  *  - `graft.multimodal.Multimodal.extractFeatures`: `mapPartitions` (d),
  *    because media decoding is per-partition native-library work by nature.
  *
  * Even the as-of join — the textbook "Spark can't express this" case —
  * composes as union + sort + last(ignoreNulls) window
  * (`graft.operators.AsOfJoin`) with the same physical shape a bespoke
  * `SparkPlan` would produce (one keyed shuffle + sort), so a custom node
  * would add maintenance surface without a plan-shape win. The trade-offs
  * are recorded in SCALING.md ("What we deliberately did NOT build"); if a
  * future operator genuinely needs (b) or (c) — e.g. a fused range-join or
  * a native sketch exchange — it belongs in this package.
  */
package object plans
