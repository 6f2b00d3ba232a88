package graft.codec

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema

/** File-backed schema registry analog.
  *
  * The reference resolves payload schemas from Confluent Schema Registry
  * under `RecordNameStrategy` (subject = record full name, id embedded in
  * the frame) — /root/reference tech.kage.event.postgres/.../
  * PostgresEventStoreAutoConfiguration.java:53-54. We have no live registry,
  * so the catalog is an immutable map id ↔ schema, optionally loaded from a
  * directory of `<id>_<fullName>.avsc` files. The catalog is small; broadcast
  * it (it is a plain serializable value) rather than doing per-row lookups
  * against external state.
  */
final class SchemaCatalog private (byId: Map[Int, Schema], byName: Map[String, Int])
    extends Serializable {

  def schemaById(id: Int): Schema =
    byId.getOrElse(id, throw new IllegalArgumentException(s"unknown schema id: $id"))

  def idFor(recordFullName: String): Int =
    byName.getOrElse(recordFullName,
      throw new IllegalArgumentException(s"unregistered record type: $recordFullName"))

  def idFor(schema: Schema): Int = idFor(schema.getFullName)

  def register(id: Int, schema: Schema): SchemaCatalog =
    new SchemaCatalog(byId + (id -> schema), byName + (schema.getFullName -> id))

  def ids: Set[Int] = byId.keySet
}

object SchemaCatalog {
  val empty: SchemaCatalog = new SchemaCatalog(Map.empty, Map.empty)

  def apply(schemas: (Int, Schema)*): SchemaCatalog =
    schemas.foldLeft(empty) { case (c, (id, s)) => c.register(id, s) }

  /** Load every `<id>_<name>.avsc` in a directory. */
  def fromDir(dir: Path): SchemaCatalog = {
    val s = Files.list(dir)
    try s.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".avsc"))
      .foldLeft(empty) { (c, p) =>
        val name = p.getFileName.toString
        val digits = name.takeWhile(_.isDigit)
        require(digits.nonEmpty && digits.length <= 9,
          s"schema file '$name' must be named <id>_<recordName>.avsc (id = 1-9 digits)")
        c.register(digits.toInt, new Schema.Parser().parse(Files.readString(p)))
      }
    finally s.close()
  }
}
