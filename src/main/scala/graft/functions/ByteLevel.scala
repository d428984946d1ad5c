package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** GPT-2-style byte-level text representation (Radford et al. 2019;
  * the `bytes_to_unicode` map every BPE stack since GPT-2 ships): a
  * bijection from the 256 byte values onto printable unicode
  * codepoints, so ANY byte sequence becomes a lossless, whitespace-free
  * string the char-level tokenizer machinery ([[graft.operators.Tokenizer]])
  * can train on — `"hello world"` → `"helloĠworld"`.
  *
  * The map: bytes that are already printable-and-not-space
  * (`!`–`~`, `¡`–`¬`, `®`–`ÿ`) keep their codepoint; the other 68
  * (controls, space, DEL, …) shift to `256 + n` in first-gap order —
  * space lands on `Ġ` (U+0120), newline on `Ċ` (U+010A).
  *
  * Everything is pure Column algebra: UTF-8 bytes viewed as latin1 (a
  * byte-transparent decode) then a single codegen'd `translate`; the
  * inverse runs the same steps backwards. The pretokenizer is GPT-2's
  * regex restricted to the Java∩RE2 subset both engines execute
  * identically: the `\s+(?!\S)` lookahead variant (which splits a
  * trailing-space run off a token boundary) is folded into plain
  * `\s+` — a documented deviation affecting only how runs of spaces
  * group, not round-trip fidelity.
  */
object ByteLevel {

  /** byte value → mapped char, GPT-2's `bytes_to_unicode`. */
  val ByteToChar: Array[Char] = {
    val keep = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ'))
      .map(_.toInt).toSet
    val out = new Array[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  private val FromChars: String = (0 until 256).map(_.toChar).mkString
  private val ToChars: String = new String(ByteToChar)

  /** GPT-2 pretokenize regex, Java∩RE2 subset (see class note). */
  val PretokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Lossless byte-level form of a string column: UTF-8 bytes through
    * the bijection. */
  def toByteLevel(c: Column): Column =
    translate(decode(encode(c, "UTF-8"), "ISO-8859-1"), FromChars, ToChars)

  /** Inverse of [[toByteLevel]] — byte-level strings back to text.
    * Total: chars outside the byte-level alphabet become `?` before the
    * byte view (Spark 4's `encode` throws on unmappable chars), and
    * invalid UTF-8 sequences become U+FFFD after it. */
  def fromByteLevel(c: Column): Column = {
    val back = regexp_replace(translate(c, ToChars, FromChars),
      "[^\\x00-\\xff]", "?")
    make_valid_utf8(encode(back, "ISO-8859-1").cast(StringType))
  }

  /** GPT-2 pretokens of a text column, each mapped to its byte-level
    * form — the training/counting unit of a byte-level BPE. */
  def pretokens(c: Column): Column =
    transform(regexp_extract_all(c, lit(PretokenPattern), lit(0)),
      t => translate(decode(encode(t, "UTF-8"), "ISO-8859-1"), FromChars, ToChars))

  /** Pretoken count — the byte-level analog of
    * [[Text.bpeTokenCount]]. */
  def pretokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(PretokenPattern), lit(0))).cast("long")
}
