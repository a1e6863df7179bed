package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Compiled vector kernels (same rationale as TextKernels: lambda HOFs are
  * interpreted; these loops are hot). */
object VectorKernels {

  private val Seed = 42L

  /** Hash of (table, bit, dim) — mirrors the fold the SQL built-in
    * `xxhash64(table, bit, dim)` performs over int children. */
  private def planeHash(table: Int, bit: Int, dim: Int): Long = {
    var h = XXH64.hashInt(table, Seed)
    h = XXH64.hashInt(bit, h)
    XXH64.hashInt(dim, h)
  }

  /** Random-hyperplane LSH signature: bit j of the result is
    * sign(<v, h_j>) where h_j is a Rademacher (±1) hyperplane derived
    * deterministically from (table, j, dim-index) hashes — no stored
    * model, identical on any executor. */
  def lshSignature(v: Array[Float], table: Int, bits: Int): Long = {
    var sig = 0L
    var j = 0
    while (j < bits) {
      var dot = 0.0
      var i = 0
      while (i < v.length) {
        val h = if ((planeHash(table, j, i) & 1L) == 1L) 1.0 else -1.0
        dot += v(i).toDouble * h
        i += 1
      }
      if (dot >= 0.0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  val lshSigUdf: UserDefinedFunction =
    udf((v: Array[Float], table: Int, bits: Int) => lshSignature(v, table, bits))
}
