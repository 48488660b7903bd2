package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** O36 `util.randomString` (`lib/util.js:33-47`): mint a random
  * alphanumeric id of the given length (default 16 — the reference's
  * default for client/node id minting).
  *
  * Spark-first: the generator is the BUILTIN `randstr` expression
  * (Spark 4), which draws uniformly from exactly the reference's
  * 62-char alphabet — uppercase, lowercase, digits
  * (`ALPHA_NUMERIC_CHARS`, `lib/util.js:17`) — inside codegen, seeded
  * per partition like `rand()`: fully distributed, no driver-side
  * entropy bottleneck, no UDF. The reference's quirks are preserved:
  * a negative length is absolute-valued (`Math.abs(parseInt(...))`,
  * `lib/util.js:36`).
  *
  * Determinism contract: with `seed` supplied the output is
  * reproducible for a fixed partitioning (the `rand(seed)` contract);
  * without it each run mints fresh ids (the reference's behavior).
  * Collision odds at the default length are 62^-16 per pair —
  * uniqueness is statistical, pinned executably by RandomStringSpec
  * and the `util_random_ids` audit query.
  */
object RandomId {
  /** The reference's alphabet, for specs: `[A-Za-z0-9]`, 62 chars. */
  val Alphabet: Set[Char] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9')).toSet

  val DefaultLength = 16

  def randomString(length: Int = DefaultLength,
      seed: Option[Long] = None): Column = {
    val len = math.abs(length) // lib/util.js:36 Math.abs(parseInt(...))
    seed.fold(expr(s"randstr($len)"))(s => expr(s"randstr($len, $s)"))
  }
}
