package graft.ids

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.UUID

/** RFC-4122 name-based UUIDs (version 3 = MD5, version 5 = SHA-1).
  *
  * The JVM only ships v3 (`UUID.nameUUIDFromBytes`); the reference engine
  * mints every resource id with a v5 UUID inside a v3 namespace
  * (reference: `fhir_etl/utils.py:29-55`), so both are implemented here
  * from the RFC directly.
  *
  * Pure, allocation-light, thread-safe (MessageDigest instances are
  * created per call — cheap relative to the hash itself and safe under
  * Spark's multi-threaded task execution).
  */
object Uuid5 {

  private def toBytes(u: UUID): Array[Byte] = {
    val b = new Array[Byte](16)
    var msb = u.getMostSignificantBits
    var lsb = u.getLeastSignificantBits
    var i = 7
    while (i >= 0) { b(i) = (msb & 0xff).toByte; msb >>>= 8; i -= 1 }
    i = 15
    while (i >= 8) { b(i) = (lsb & 0xff).toByte; lsb >>>= 8; i -= 1 }
    b
  }

  private def fromBytes(hash: Array[Byte], version: Int): UUID = {
    // RFC-4122 §4.3: set version nibble and variant bits on the first
    // 16 bytes of the digest.
    hash(6) = ((hash(6) & 0x0f) | (version << 4)).toByte
    hash(8) = ((hash(8) & 0x3f) | 0x80).toByte
    var msb = 0L
    var lsb = 0L
    var i = 0
    while (i < 8) { msb = (msb << 8) | (hash(i) & 0xff); i += 1 }
    while (i < 16) { lsb = (lsb << 8) | (hash(i) & 0xff); i += 1 }
    new UUID(msb, lsb)
  }

  private def nameBased(algo: String, version: Int, namespace: UUID, name: Array[Byte]): UUID = {
    val md = MessageDigest.getInstance(algo)
    md.update(toBytes(namespace))
    md.update(name)
    fromBytes(md.digest(), version)
  }

  /** UUIDv3 (MD5) — equivalent to Python's `uuid.uuid3(namespace, name)`. */
  def uuid3(namespace: UUID, name: String): UUID =
    nameBased("MD5", 3, namespace, name.getBytes(StandardCharsets.UTF_8))

  /** UUIDv5 (SHA-1) — equivalent to Python's `uuid.uuid5(namespace, name)`. */
  def uuid5(namespace: UUID, name: String): UUID =
    nameBased("SHA-1", 5, namespace, name.getBytes(StandardCharsets.UTF_8))

  /** RFC-4122 Appendix C / Python `uuid.NAMESPACE_DNS`. */
  val NamespaceDns: UUID = UUID.fromString("6ba7b810-9dad-11d1-80b4-00c04fd430c8")

  /** UUID syntactic validity (any version), mirroring the reference's
    * `is_valid_uuid` (`fhir_etl/utils.py:34-42` — the version argument is
    * effectively unchecked by Python, so none is enforced here either). */
  def isValidUuid(s: String): Boolean =
    s != null && scala.util.Try(UUID.fromString(s)).isSuccess
}

/** Deterministic project-scoped id minting — the reference's `IDHelper`
  * convention (`fhir_etl/utils.py:29-55`, duplicated at
  * `fhir_etl/oneKgenomes/oneKg_fhirizer.py:21-47` and
  * `fhir_etl/GTEx/gtex_fhirizer.py:25-51`):
  *
  *   namespace = uuid3(NAMESPACE_DNS, site)
  *   mint(s)   = uuid5(namespace, s"$project/$s")
  *   mint(identifier) = mint(s"$resourceType/$system|$value")
  *
  * The namespace is computed once per minter instance (the reference
  * recomputes it per row — SURVEY.md §4).
  */
final case class IdMinter(site: String, project: String) extends Serializable {
  val namespace: UUID = Uuid5.uuid3(Uuid5.NamespaceDns, site)

  def mint(identifierString: String): String =
    Uuid5.uuid5(namespace, s"$project/$identifierString").toString

  def mintIdentifier(resourceType: String, system: String, value: String): String =
    mint(s"$resourceType/$system|$value")

  // ---- column-level minting (codegen-native, no UDF) ----------------
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  private val namespaceHex: String = namespace.toString.replace("-", "")

  /** UUIDv5 over this minter's namespace as a pure column expression:
    * sha1(namespace-bytes ++ utf8(name)) then RFC-4122 §4.3 version/
    * variant surgery on the hex string. The variant nibble map
    * (c & 0x3 | 0x8) is a 16-char `translate`. Stays fully inside
    * whole-stage codegen — this is the hot path of every resource id at
    * scale, where a Scala UDF would pay per-row (de)serialization. */
  def uuid5Col(name: Column): Column = {
    val h = sha1(concat(to_binary(lit(namespaceHex), lit("hex")),
      encode(name, "UTF-8")))
    concat_ws("-",
      substring(h, 1, 8),
      substring(h, 9, 4),
      concat(lit("5"), substring(h, 14, 3)),
      concat(translate(substring(h, 17, 1),
        "0123456789abcdef", "89ab89ab89ab89ab"), substring(h, 18, 3)),
      substring(h, 21, 12))
  }

  /** Column form of `mint`. */
  def mintCol(identifierString: Column): Column =
    uuid5Col(concat(lit(project + "/"), identifierString))

  /** Column form of `mintIdentifier` (fixed type/system, per-row value). */
  def mintIdentifierCol(resourceType: String, system: String, value: Column): Column =
    mintCol(concat(lit(s"$resourceType/$system|"), value))
}

object IdMinter {
  /** 1KG site constant — note it already contains the scheme, which the
    * reference then prefixes again with `https://` when building systems
    * (`fhir_etl/oneKgenomes/oneKg_fhirizer.py:68`); that doubled prefix is
    * part of the frozen id chain, reproduced in etl.OneKg. */
  val ThousandGenomesSite = "https://ftp.1000genomes.ebi.ac.uk/vol1/ftp/"
  val GtexSite = "gtexportal.org/home/"

  val oneKg: IdMinter = IdMinter(ThousandGenomesSite, "1KG")
  val gtex: IdMinter = IdMinter(GtexSite, "GTEX")
}
