package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Audio frame analysis over raw binary payloads (multimodal north star:
  * the audio leg next to mm_frame_* video ops; cf. reference media
  * handling being opaque blobs end-to-end). The payload is interpreted as
  * unsigned 8-bit PCM centered at 128 — the stub-codec convention of this
  * suite (no audio libs in the container): REAL byte-level Spark plumbing
  * (binary column in, typed frame features out, payload-local narrow map)
  * with a deterministic sample transform where a codec would sit.
  *
  * Per frame of `frameLen` samples the expression emits the energy as the
  * EXACT integer Σ (b−128)² — a sum of ≤ frameLen·127² fits a long with
  * room to spare, so downstream silence thresholds, peaks, and means stay
  * bit-identical on any engine that replays the integer arithmetic (the
  * DuckDB oracle does, via ord() over the same ASCII bytes). Trailing
  * bytes short of a full frame are dropped, matching the mm_frame_sample
  * convention.
  *
  * Scale shape: per-document, payload-local, no state across rows — only
  * the n_frames-long energy array leaves the expression, never payload
  * bytes. Frame-level stats then compose from codegen'd array functions
  * (aggregate / array_max / filter) instead of an explode+groupBy shuffle.
  */
object AudioOps {
  /** Exact per-frame energies: Σ (byte − 128)² per full frame. */
  def frameEnergies(bytes: Array[Byte], frameLen: Int): Array[Long] = {
    val nf = bytes.length / frameLen
    val out = new Array[Long](nf)
    var f = 0
    while (f < nf) {
      var acc = 0L
      var j = f * frameLen
      val end = j + frameLen
      while (j < end) {
        val s = (bytes(j) & 0xff) - 128
        acc += (s * s).toLong
        j += 1
      }
      out(f) = acc
      f += 1
    }
    out
  }
}

/** audio_frame_energies(payload) → array<bigint> of per-frame Σ(b−128)². */
case class AudioFrameEnergiesExpr(child: Expression, frameLen: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(payload: Any): Any =
    new GenericArrayData(
      AudioOps.frameEnergies(payload.asInstanceOf[Array[Byte]], frameLen))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioFunctions {
  def frameEnergies(payload: Column, frameLen: Int): Column =
    Bridge.column(AudioFrameEnergiesExpr(Bridge.expression(payload), frameLen))
}
