package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Column entry point for Catalyst's own `BloomFilterMightContain` — the
  * exact expression Spark's `InjectRuntimeFilter` rule plants on probe
  * sides, reused here with an EXPLICITLY built filter instead of the
  * rule's ScalarSubquery (the rule only fires under its own join-shape
  * and size heuristics; an engine operator must be able to demand the
  * filter). Codegen'd membership test over a constant binary literal:
  * the serialized bitmap ships once per task binary, the per-row cost is
  * two Murmur probes of an on-heap long[].
  *
  * Hash contract (must match on build and probe or the filter silently
  * passes everything): the bitmap is built over `xxhash64(key)` values
  * inserted via `putLong`, and the probe side tests
  * `mightContainLong(xxhash64(key))` — the same pre-hash convention
  * `BloomFilterAggregate`/`BloomFilterMightContain` use internally.
  */
object BloomColumn {
  def mightContain(serializedBloom: Array[Byte], key: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(serializedBloom, BinaryType),
      new XxHash64(Seq(ExpressionUtils.expression(key)))))
}
