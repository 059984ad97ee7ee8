package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-link traversal & claim-path helpers (SURVEY §2.B B4-B8) —
  * the SurrealQL dot-path surface as composable DataFrame operations.
  *
  * SurrealQL semantics preserved:
  *   - `entity.claims.claims` link traversal = a 1:1 equi-join on the
  *     (src_tb, id) claims key (B4). The claims side of the join is
  *     keyed by the entity's own id, so the join is co-partitioned if
  *     both tables were written by the same pipeline — at 100 TB this
  *     is a shuffle on the narrow key only, and AQE/broadcast kicks in
  *     for selective entity subsets;
  *   - `claims[WHERE id = Property:N]` = higher-order `filter` over
  *     the in-row array (B5) — no explode, no shuffle;
  *   - `[0]` = null-safe `try_element_at(arr, 1)` (B6), NONE → null under ANSI;
  *   - `.value.ClaimValueData.Quantity.amount` = struct field chain on
  *     the union schema (B7), missing branch → null, exactly
  *     SurrealQL's NONE propagation.
  */
object Paths {

  /** B4: dereference `Entity.claims` — left join entities to their
    * claims row, exposing the claim array as `claims_arr`. */
  def withClaims(entities: DataFrame, claims: DataFrame): DataFrame = {
    val c = claims.select(
      col("id").as("_c_id"), col("src_tb").as("_c_src"),
      col("claims").as("claims_arr"))
    entities.join(c,
      entities("claims.id") === col("_c_id.id") &&
        entities("id.tb") === col("_c_src"),
      "left").drop("_c_id", "_c_src")
  }

  /** B5: `claims[WHERE id = <tb>:<pid>]` over a claim array column. */
  def claimsWhere(arr: Column, pid: Long, tb: String = "Property"): Column =
    filter(arr, c =>
      c.getField("id").getField("tb") === tb &&
        c.getField("id").getField("id") === pid)

  /** `claims[WHERE id = Property:pid].value.ClaimValueData.Quantity
    * .amount` — the projected amounts array (NONEs kept, as SurrealQL
    * keeps them: a non-quantity claim contributes null). */
  def quantityAmounts(arr: Column, pid: Long): Column =
    transform(claimsWhere(arr, pid), c => c.getField("value")
      .getField("ClaimValueData").getField("Quantity").getField("amount"))

  /** `(claims[WHERE id = Property:pid].value...amount)[0]` (B6). */
  def quantityAmount(arr: Column, pid: Long): Column =
    try_element_at(quantityAmounts(arr, pid), lit(1))

  /** `claims[WHERE id = Property:pid].value.Thing` — record links. */
  def things(arr: Column, pid: Long): Column =
    transform(claimsWhere(arr, pid), c =>
      c.getField("value").getField("Thing"))

  /** `(claims[WHERE ...].value.Thing)[0]`. */
  def thing(arr: Column, pid: Long): Column =
    try_element_at(things(arr, pid), lit(1))

  /** B11: `claims[WHERE id = Property:pid].value.Thing == []` — true
    * iff the entity has NO claim for `pid` at all (an existing claim
    * of any value type yields a non-empty array of Things-or-NONEs,
    * which SurrealQL compares ≠ []; see `test_filter.surql` + the
    * "delete if entity doesn't have the claim" doc comment). */
  def lacksProperty(arr: Column, pid: Long): Column =
    size(claimsWhere(arr, pid)) === 0
}
