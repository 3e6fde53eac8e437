package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe shuffle join via key salting — the manual remedy for the
  * case AQE's skew splitting cannot fully cover (a single join key so
  * hot that even split shuffle blocks serialize behind one task's
  * build side).
  *
  * Shape: the fact side gets a deterministic salt in [0, S) derived
  * from a caller-chosen discriminator column (NOT the join key — same
  * key must fan out across salts); the build side is exploded ×S so
  * every (key, salt) bucket finds its match. The join key becomes
  * (key, salt), spreading a hot key over S shuffle partitions. Join
  * output is IDENTICAL to the unsalted join — verified by the
  * `salted_join` oracle query, whose oracle SQL is the plain join.
  *
  * Cost model: build side inflates ×S (choose S ≈ hot-key excess over
  * partition budget — 8-32 covers most skew) — so salt the SMALL side
  * ×S, never the fact. AQE stays on; salting composes with it.
  */
object Salting {

  /** Inner equi-join of `fact` ⋈ `dim` on `key`, skew-spread over
    * `salts` buckets. `discriminator` must be deterministic per fact
    * row and (near-)uniform — e.g. a row id — so a hot key's rows
    * spread evenly.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      discriminator: Column, salts: Int): DataFrame = {
    require(salts >= 1)
    val salted = fact.withColumn("__salt", pmod(hash(discriminator), lit(salts)))
    val exploded = dim
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
