package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass turn segmentation (SURVEY.md §2.8 F1, reference chunking
  * loop `src/app.py:218-224,305-311`): split on blank lines, re-chunk every
  * paragraph into ≤10-line segments, carry each segment's char offset in
  * turn coordinates.
  *
  * Replaces [[graft.operators.Segmentation.segmentsExpr]] (the nested
  * `aggregate`/`transform` SQL form) in the extraction hot path: Spark
  * evaluates higher-order functions interpreted (per-lambda `eval`, one
  * UTF8String array per `split` call), and the rechunk lambda re-ran the
  * line split + offset aggregate once PER CHUNK — O(paragraphs × chunks ×
  * lines) with a regex split per step. Profiling the flagship pipeline at
  * mult=64 put ~40% of all executor samples inside that expression tree
  * (UTF8String.split / Pattern.match / interpreted eval / getNumChars).
  * This kernel is one linear scan over the UTF-8 bytes, and each emitted
  * segment is a zero-copy slice of the original byte array — every `\n\n`
  * paragraph and every 10-line chunk of it is a CONTIGUOUS byte range of
  * the turn text, so no segment string is ever built.
  *
  * Semantics are pinned by tests to [[graft.operators.Segmentation
  * .segmentTextOracle]] (the Python-literal loop) and differentially to the
  * retired SQL expression: Python-style split (trailing empty paragraphs
  * and lines kept), `seg_start` counts CODE POINTS (what SQL `length`
  * returns), exact on ASCII and on any UTF-8 since `\n` bytes cannot occur
  * inside a multi-byte code point.
  */
object Segments {

  val SegLines = 10

  val segType: DataType = ArrayType(
    StructType(Seq(
      StructField("seg_text", StringType, nullable = false),
      StructField("seg_start", IntegerType, nullable = false))),
    containsNull = false)

  /** One-pass kernel: turn text -> array<struct<seg_text, seg_start>>.
    * Called from generated code — keep the signature static-friendly. */
  def segmentsOf(text: UTF8String): ArrayData = {
    val bytes = text.getBytes // the backing array when exact, else one copy
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](8)
    var cpCount = 0 // code points in bytes[0, cpMark)
    var cpMark = 0
    // count code points between byte marks incrementally — segments are
    // emitted in byte order, so the whole turn is scanned exactly once
    def cpAt(byteIdx: Int): Int = {
      var i = cpMark
      var c = cpCount
      while (i < byteIdx) {
        if ((bytes(i) & 0xc0) != 0x80) c += 1
        i += 1
      }
      cpMark = byteIdx; cpCount = c
      c
    }
    var lineStarts = new Array[Int](16)
    var paraStart = 0
    var done = false
    while (!done) {
      // paragraph = up to the next non-overlapping "\n\n" (Python split)
      var paraEnd = -1
      var i = paraStart
      while (paraEnd < 0 && i + 1 < n) {
        if (bytes(i) == '\n' && bytes(i + 1) == '\n') paraEnd = i
        else i += 1
      }
      if (paraEnd < 0) { paraEnd = n; done = true }
      // line starts inside [paraStart, paraEnd)
      var nLines = 1
      lineStarts(0) = paraStart
      i = paraStart
      while (i < paraEnd) {
        if (bytes(i) == '\n') {
          if (nLines == lineStarts.length)
            lineStarts = java.util.Arrays.copyOf(lineStarts, nLines * 2)
          lineStarts(nLines) = i + 1
          nLines += 1
        }
        i += 1
      }
      // ≤10-line chunks; each is the contiguous byte range from its first
      // line's start to the byte before the NEXT chunk's first line (the
      // joining '\n' is dropped), or to the paragraph end for the last
      var ci = 0
      while (ci < nLines) {
        val segStart = lineStarts(ci)
        val segEnd =
          if (ci + SegLines < nLines) lineStarts(ci + SegLines) - 1 else paraEnd
        out += new GenericInternalRow(Array[Any](
          UTF8String.fromBytes(bytes, segStart, segEnd - segStart),
          Integer.valueOf(cpAt(segStart))))
        ci += SegLines
      }
      paraStart = paraEnd + 2
    }
    new GenericArrayData(out.toArray)
  }

  case class TurnSegmentsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = segType
    override def prettyName: String = "graft_turn_segments"
    override protected def nullSafeEval(input: Any): Any =
      segmentsOf(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Segments.segmentsOf($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def turnSegments(text: Column): Column =
    ColumnShim.column(TurnSegmentsExpr(ColumnShim.expression(text)))
}
