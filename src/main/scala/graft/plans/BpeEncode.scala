package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE encoder expression: `bpe_encode(text)` → array of subword
  * tokens under a trained merge table (see [[graft.operators.Bpe]]).
  *
  * Pre-tokenization matches the model's mode: ascii is
  * `q_text_tokens`' regex pre-tokenizer exactly (maximal `[a-z]+` runs
  * of the lowercased text); unicode is maximal same-category runs —
  * `\p{L}+` | `\p{N}+` | other-non-whitespace — so every
  * non-whitespace code point of the input lands in a unit (see
  * [[graft.operators.Bpe]]). Each unit is then split into
  * single-code-point symbols plus the standard `</w>` end-of-word
  * sentinel and greedily merged: the adjacent pair with the LOWEST
  * learned rank merges first, left-to-right within the word, until no
  * adjacent pair is in the table — the classic Sennrich (2016)
  * inference rule, and the one property that makes two encoders with
  * the same merge table byte-compatible.
  *
  * The merge table rides inside the expression (serialized once into
  * the stage's task binary, NOT per row), so encoding is a pure
  * map-side pass — the plan shape a 100 TB tokenization sweep needs:
  * zero shuffles, zero driver traffic, the table broadcast
  * piggybacking on Spark's own task-binary broadcast. A per-task memo
  * (bounded, natural-language word frequency is Zipfian so the top 64k
  * distinct words absorb nearly every lookup) makes the amortized cost
  * per word O(1) after first sight. CodegenFallback is fine here for
  * the same reason as [[MinHashSignature]]: the cost is the merge loop
  * itself, which is compiled JVM code either way.
  */
case class BpeEncode(child: Expression, merges: Array[(String, String)],
    emitIds: Boolean = false,
    mode: String = graft.operators.Bpe.ModeAscii,
    alphabet: Array[String] =
      ('a' to 'z').map(String.valueOf(_)).toArray)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    if (emitIds) ArrayType(IntegerType, containsNull = false)
    else ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (emitIds) "bpe_encode_ids" else "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  // Rank lookup rebuilt lazily per deserialized (= per-task) instance;
  // only the compact pair array crosses the wire. The key is
  // length-prefixed ("<|a|>:ab") so it stays unambiguous even when
  // unicode-mode symbols contain ANY character (a separator char could
  // itself appear inside a symbol).
  private def pairKey(a: String, b: String): String =
    a.length + ":" + a + b
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(pairKey(merges(i)._1, merges(i)._2), Integer.valueOf(i))
      i += 1
    }
    m
  }

  // Per-task word→tokens memo. Tasks each deserialize their own
  // expression instance, so no cross-thread sharing; bounded so a
  // pathological high-entropy corpus can't grow it without limit
  // (inserts just stop at capacity — correctness never depends on it).
  @transient private lazy val memo =
    new java.util.HashMap[String, Array[String]](1 << 12)
  private val memoCap = 1 << 16

  /** Greedy lowest-rank-first merge of one pre-tokenized word —
    * linked-list + min-heap, O(L log L) per word instead of the naive
    * O(L²) rescan (which bites hard on unicode/byte modes, where an
    * unsegmented CJK sentence or a long punctuation run is ONE unit).
    *
    * Semantics are EXACTLY the classic sweep ("repeat: lowest-rank
    * pair present merges, occurrences left-to-right"): heap entries
    * order by (rank, left-slot), slots are stable original positions
    * so same-rank occurrences pop left-to-right, stale entries (a
    * neighbor already merged away) re-validate on pop, and merging the
    * leftmost occurrence of a pair can never create a new occurrence
    * of the SAME pair to its left (the merged symbol a+b differs from
    * both a and b), so one-at-a-time equals the sweep. BpeSpec's
    * Sennrich sequence + a PropertySpec differential against the naive
    * rescan pin the equivalence.
    */
  private def encodeWord(w: String): Array[String] = {
    val hit = memo.get(w)
    if (hit != null) return hit
    val init: Array[String] =
      if (mode == graft.operators.Bpe.ModeBytes)
        graft.operators.Bpe.byteSymbols(w)
      else graft.operators.Bpe.codePoints(w) :+ "</w>"
    val out = if (init.length < 2 || merges.isEmpty) init else {
      val n = init.length
      val sym = java.util.Arrays.copyOf(init, n)
      val nxt = new Array[Int](n)
      val prv = new Array[Int](n)
      val dead = new Array[Boolean](n)
      var i = 0
      while (i < n) { nxt(i) = i + 1; prv(i) = i - 1; i += 1 }
      nxt(n - 1) = -1
      // (rank, slot) packed into one long: rank and slot are both
      // non-negative ints, so natural long order = (rank, slot) order
      val heap = new java.util.PriorityQueue[java.lang.Long](n)
      def offer(slot: Int): Unit = {
        val j = nxt(slot)
        if (j >= 0) {
          val r = rank.get(pairKey(sym(slot), sym(j)))
          if (r != null)
            heap.offer((r.longValue() << 32) | slot.toLong)
        }
      }
      i = 0
      while (i < n - 1) { offer(i); i += 1 }
      while (!heap.isEmpty) {
        val e = heap.poll().longValue()
        val r = (e >>> 32).toInt
        val s = (e & 0xffffffffL).toInt
        if (!dead(s)) {
          val j = nxt(s)
          if (j >= 0) {
            // stale guard: the pair at this slot must still be the one
            // this entry was queued for
            val rr = rank.get(pairKey(sym(s), sym(j)))
            if (rr != null && rr.intValue() == r) {
              sym(s) = sym(s) + sym(j)
              dead(j) = true
              val k = nxt(j)
              nxt(s) = k
              if (k >= 0) prv(k) = s
              if (prv(s) >= 0) offer(prv(s))
              offer(s)
            }
          }
        }
      }
      var cnt = 0
      i = 0
      while (i >= 0) { cnt += 1; i = nxt(i) }
      val res = new Array[String](cnt)
      var d = 0
      i = 0
      while (i >= 0) { res(d) = sym(i); d += 1; i = nxt(i) }
      res
    }
    if (memo.size < memoCap) memo.put(w, out)
    out
  }

  // Token-id vocabulary: alphabet chars in order (ascii: 0–25 =
  // 'a'–'z'), then `</w>`, then merge PRODUCTS in rank order
  // (deduplicated: two rules can build the same string — e.g. a+bc and
  // ab+c — and the TOKEN gets one id, its first); unicode mode gets a
  // final `<unk>` id for characters outside the trained alphabet.
  // This is exactly [[graft.operators.Bpe.BpeModel.vocabIds]]; BpeSpec
  // pins the two stay equal.
  @transient private lazy val tokenId: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](
      (alphabet.length + merges.length) * 2)
    var a = 0
    while (a < alphabet.length) {
      m.put(alphabet(a), Integer.valueOf(a)); a += 1
    }
    // byte mode has no </w> sentinel (boundaries live in space bytes)
    var next = alphabet.length
    if (mode != graft.operators.Bpe.ModeBytes) {
      m.put("</w>", Integer.valueOf(alphabet.length))
      next += 1
    }
    var i = 0
    while (i < merges.length) {
      val tok = merges(i)._1 + merges(i)._2
      if (!m.containsKey(tok)) { m.put(tok, Integer.valueOf(next)); next += 1 }
      i += 1
    }
    m
  }
  @transient private lazy val unkId: Integer =
    Integer.valueOf(tokenId.size)

  private def emit(toks: Array[String],
      out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    var k = 0
    while (k < toks.length) {
      if (emitIds) {
        val id = tokenId.get(toks(k))
        // ascii mode cannot miss (pre-tokenizer emits a–z only);
        // unicode maps out-of-alphabet chars to the trailing <unk> id
        out += (if (id == null) unkId.intValue() else id.intValue())
      } else out += UTF8String.fromString(toks(k))
      k += 1
    }
  }

  // bytes mode pre-tokenizer — GPT-2 pattern compiled once per task
  @transient private lazy val gpt2 =
    java.util.regex.Pattern.compile(graft.operators.Bpe.Gpt2Units)

  override def nullSafeEval(v: Any): Any = {
    if (mode == graft.operators.Bpe.ModeBytes) {
      // byte mode is CASE- and WHITESPACE-FAITHFUL: raw text through
      // the GPT-2 pattern (which covers every character), each unit
      // merged over its byte-char symbols — decode∘encode = identity
      val raw = v.asInstanceOf[UTF8String].toString
      val out = new scala.collection.mutable.ArrayBuffer[Any](64)
      val m = gpt2.matcher(raw)
      while (m.find()) emit(encodeWord(m.group()), out)
      return new GenericArrayData(out.toArray)
    }
    val text = v.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT)
    val out = new scala.collection.mutable.ArrayBuffer[Any](64)
    var i = 0
    val n = text.length
    if (mode == graft.operators.Bpe.ModeAscii) {
      while (i < n) {
        val c = text.charAt(i)
        if (c >= 'a' && c <= 'z') {
          var j = i + 1
          while (j < n && text.charAt(j) >= 'a' && text.charAt(j) <= 'z') j += 1
          emit(encodeWord(text.substring(i, j)), out)
          i = j
        } else i += 1
      }
    } else {
      // unicode units: maximal same-category runs — letters, numbers,
      // other-non-whitespace — over CODE POINTS (category switches end
      // a unit; only whitespace is elided). MUST mirror the Java-regex
      // semantics of Bpe.UnicodeUnits exactly: `\s` without (?U) is
      // ASCII [ \t\n\x0B\f\r] only; `\p{L}` is general category L*
      // (= Character.isLetter); `\p{N}` is N* = Nd|Nl|No (wider than
      // Character.isDigit, which is Nd alone).
      def cat(cp: Int): Int =
        if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
            cp == '\f' || cp == '\r') 0
        else if (Character.isLetter(cp)) 1
        else {
          val t = Character.getType(cp)
          if (t == Character.DECIMAL_DIGIT_NUMBER ||
              t == Character.LETTER_NUMBER ||
              t == Character.OTHER_NUMBER) 2
          else 3
        }
      while (i < n) {
        val cp = text.codePointAt(i)
        val c = cat(cp)
        if (c == 0) i += Character.charCount(cp)
        else {
          var j = i + Character.charCount(cp)
          var more = true
          while (more && j < n) {
            val cp2 = text.codePointAt(j)
            if (cat(cp2) == c) j += Character.charCount(cp2) else more = false
          }
          emit(encodeWord(text.substring(i, j)), out)
          i = j
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Inverse of byte-mode [[BpeEncode]]: concatenate the token strings
  * and map each byte-char back through the GPT-2 bijection to the
  * original UTF-8 bytes — `bpe_decode_bytes(tokens)` is the exact
  * identity inverse of `bpe_encode(text)` under `mode = bytes`
  * (BpeSpec pins it on mixed-case/whitespace/emoji text). Pure
  * map-side, like the encoder.
  */
case class BpeDecodeBytes(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_decode_bytes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val sb = new java.lang.StringBuilder(arr.numElements() * 4)
    var i = 0
    while (i < arr.numElements()) {
      sb.append(arr.getUTF8String(i).toString)
      i += 1
    }
    val chars = sb.toString
    val bytes = new Array[Byte](chars.length)
    var j = 0
    while (j < chars.length) {
      bytes(j) = graft.operators.Bpe.charToByte(chars.charAt(j))
      j += 1
    }
    UTF8String.fromBytes(bytes)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeEncode {
  /** Register `bpe_encode(text)` (subword strings) and
    * `bpe_encode_ids(text)` (vocabulary ids — what a training pipeline
    * materializes) bound to one trained merge table. Idempotent;
    * re-registering rebinds to the new table.
    */
  def register(spark: SparkSession, merges: Array[(String, String)]): Unit =
    register(spark, graft.operators.Bpe.BpeModel(merges, 1.0))

  /** Model-carrying registration: binds the functions to the model's
    * merge table, pre-tokenizer mode, and alphabet (id space).
    */
  def register(spark: SparkSession,
      model: graft.operators.Bpe.BpeModel): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_encode",
      exprs => BpeEncode(exprs.head, model.merges,
        mode = model.mode, alphabet = model.alphabet),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_encode_ids",
      exprs => BpeEncode(exprs.head, model.merges, emitIds = true,
        mode = model.mode, alphabet = model.alphabet),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_decode_bytes",
      exprs => BpeDecodeBytes(exprs.head),
      "built-in")
  }
}
