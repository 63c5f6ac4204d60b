package graft.functions

import java.nio.CharBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Byte-level encoding repair — the second half of the reference's F9
  * (`Conversor de Formatos.py:105-136`): text that was UTF-8 on disk
  * but decoded as cp1252 ("Ã§Ã£o" mojibake) is repaired by the inverse
  * byte round-trip `encode(cp1252) → decode(utf-8)`, falling back to
  * iso-8859-1, and returning the input untouched when neither
  * round-trip yields valid UTF-8.
  *
  * Both legs are STRICT (CodingErrorAction.REPORT, matching Python's
  * default-raising `str.encode`/`bytes.decode`): a clean string with
  * real accents fails the decode leg and passes through unchanged, so
  * the repair is safe to apply to whole columns — mojibake is fixed,
  * everything else is the identity. Note the five cp1252-undefined
  * bytes (0x81, 0x8D, 0x8F, 0x90, 0x9D): a UTF-8 sequence containing
  * them (e.g. 'Á' = C3 81) cannot have been produced by a cp1252
  * mis-decode in the first place (that decode is lossy → U+FFFD);
  * their real-world corruption is the latin-1 mis-decode, which the
  * fallback leg repairs.
  *
  * This is the repo's one sanctioned Scala UDF (SURVEY §2.12):
  * charset round-trips need the JVM codec machinery, which has no
  * Column-expression equivalent. It stays off hot paths — the regex
  * library repair (`Scalars.mojibakePairs`) is the codegen'd
  * scan-speed variant for known patterns.
  */
object EncodingRepair {

  private def strictRoundTrip(s: String, charsetName: String): Option[String] =
    try {
      val bytes = Charset.forName(charsetName).newEncoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
        .encode(CharBuffer.wrap(s))
      val repaired = Charset.forName("UTF-8").newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
        .decode(bytes)
      Some(repaired.toString)
    } catch { case _: CharacterCodingException => None }

  /** cp1252→utf8 repair with iso-8859-1 fallback; identity on strings
    * that aren't mis-decoded UTF-8 (including all pure ASCII). */
  def repairEncoding(s: String): String =
    if (s == null) null
    else strictRoundTrip(s, "windows-1252")
      .orElse(strictRoundTrip(s, "ISO-8859-1"))
      .getOrElse(s)

  val repairEncodingUdf: UserDefinedFunction = udf(repairEncoding _)

  def repair(c: Column): Column = repairEncodingUdf(c)
}
