package graft.text

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._

/** Mojibake repair — undo the single most common real-world text
  * corruption in web corpora: UTF-8 bytes decoded as Windows-1252
  * ("â€™" where "’" was meant), the core case of the ftfy tool.
  *
  * Deliberately a FIXED TABLE over an allowlist of intended
  * characters (curly quotes/dashes/ellipsis-class punctuation, the
  * common accented Latin letters, nbsp/degree/©/®), not a general
  * re-decoder: the general transform (encode cp1252 → decode UTF-8)
  * must guess whether text is mojibake at all and mis-fires on
  * legitimate "Â"-class characters, while every table key is a
  * sequence essentially nonexistent in clean text (ftfy's own
  * argument). Keys are DERIVED, not hand-typed — each is
  * `new String(intended.getBytes(UTF_8), "windows-1252")`, so the
  * byte-level mapping is correct by construction. Characters whose
  * UTF-8 bytes hit one of cp1252's five UNMAPPED bytes (notably ”,
  * whose 0x9D different decoders render as a C1 control, U+FFFD, or
  * nothing at all) are filtered out: their mojibake has no single
  * canonical spelling, and repairing the truncated "â€" remnant
  * safely needs lookahead to avoid eating unlisted "â€x" sequences —
  * lookaround RE2, the oracle engine, does not have.
  *
  * The whole transform is a chain of literal `replace` expressions:
  * codegen'd, zero shuffle, replayed verbatim by the oracle. Keys are
  * mutually prefix-free (3-byte sequences lead with â, 2-byte with
  * Ã/Â) and longer keys run first; the chain order is part of the
  * published contract the oracle replays.
  */
class MojibakeRepair(override val uid: String)
    extends Transformer with HasInputCol with HasOutputCol
    with GraftWritable {
  def this() = this(Identifiable.randomUID("MojibakeRepair"))
  setDefault(outputCol -> "repaired")

  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF().withColumn($(outputCol),
      MojibakeRepair.repair(col(getInputCol)))

  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField($(outputCol), StringType))
  override def copy(extra: ParamMap): MojibakeRepair = defaultCopy(extra)
}

object MojibakeRepair extends GraftReadable[MojibakeRepair] {

  /** The mojibake rendering of an intended string: its UTF-8 bytes
    * mis-decoded as Windows-1252 (Java maps the five undefined cp1252
    * bytes to C1 controls, matching what a faithful mis-decode
    * propagates). */
  def moji(intended: String): String = new String(
    intended.getBytes(java.nio.charset.StandardCharsets.UTF_8),
    "windows-1252")

  /** Intended characters whose mojibake forms are repaired; the
    * companion filters out any whose mojibake is ambiguous (hits an
    * unmapped cp1252 byte). */
  val candidateChars: Seq[String] = Seq(
    // General Punctuation block (3-byte UTF-8)
    "‘", "’", "‚", "“", "”", "„",
    "–", "—", "†", "‡", "•", "…",
    "‰", "€", "™",
    // Latin-1 letters (2-byte UTF-8)
    "é", "è", "ê", "á", "à", "â", "ä", "ö", "ô", "ü", "û", "ñ", "ç",
    "ó", "ò", "í", "ì", "ú", "ù", "ß",
    // Latin-1 punctuation/symbols
    " ", "°", "©", "®", "«", "»")

  /** The repairable subset: a candidate is dropped when its mojibake
    * contains U+FFFD — an unmapped cp1252 byte, hence no canonical
    * corrupted spelling to match. */
  val intendedChars: Seq[String] =
    candidateChars.filter(c => !moji(c).contains('\uFFFD'))

  /** (mojibake, intended), longest keys first. */
  val table: Seq[(String, String)] =
    intendedChars.map(c => (moji(c), c)).sortBy(-_._1.length)

  /** The repair chain as one nested literal-replace expression. */
  def repair(c: Column): Column =
    table.foldLeft(c) { case (acc, (bad, good)) =>
      replace(acc, lit(bad), lit(good))
    }
}
