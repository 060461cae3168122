package graft.core

import org.apache.avro.Schema
import org.apache.avro.generic.GenericData

import graft.SparkSpec

/** Schema-registry scheme: Confluent wire framing, id-resolved writer
  * schemas, subject evolution, and registry/repository resolution.
  */
class SchemaRegistrySpec extends SparkSpec {

  private val v1 =
    """{"type":"record","name":"User","fields":[
      |  {"name":"id","type":"long"},
      |  {"name":"name","type":"string"}]}""".stripMargin
  private val v2 =
    """{"type":"record","name":"User","fields":[
      |  {"name":"id","type":"long"},
      |  {"name":"name","type":"string"},
      |  {"name":"email","type":"string","default":""}]}""".stripMargin

  private def rec(schemaJson: String, fields: (String, Any)*) = {
    val r = new GenericData.Record(new Schema.Parser().parse(schemaJson))
    fields.foreach { case (k, v) => r.put(k, v) }
    r
  }

  test("framing: magic byte + big-endian id + avro payload") {
    EmbeddedSchemaRegistry.reset()
    val reg = EmbeddedSchemaRegistry.register("r1", "user-value", v1)
    val ser = new SchemaRegistryValueSerializer("r1/user-value")
    val bytes = ser.serialize(rec(v1, "id" -> 7L, "name" -> "a"))
    assert(bytes(0) == 0, "magic byte")
    val id = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
    assert(id == reg.id, "4-byte big-endian schema id")
    val back = ser.deserialize(bytes).get
    assert(back.get("id") == 7L && back.get("name").toString == "a")
  }

  test("subject evolution: old frames decode with their writer schema") {
    EmbeddedSchemaRegistry.reset()
    EmbeddedSchemaRegistry.register("r1", "user-value", v1)
    val ser = new SchemaRegistryValueSerializer("r1/user-value")
    val oldFrame = ser.serialize(rec(v1, "id" -> 1L, "name" -> "old"))
    // subject evolves; the serializer now writes v2 frames
    val r2 = EmbeddedSchemaRegistry.register("r1", "user-value", v2)
    assert(r2.version == 2)
    val newFrame = ser.serialize(
      rec(v2, "id" -> 2L, "name" -> "new", "email" -> "n@x"))
    assert(java.nio.ByteBuffer.wrap(newFrame, 1, 4).getInt == r2.id)
    // v1 frame still decodes via its id — the registry's whole point
    val oldBack = ser.deserialize(oldFrame).get
    assert(oldBack.get("name").toString == "old")
    assert(oldBack.getSchema.getField("email") == null, "v1 writer schema used")
    val newBack = ser.deserialize(newFrame).get
    assert(newBack.get("email").toString == "n@x")
    // re-registering an identical schema is idempotent
    assert(EmbeddedSchemaRegistry.register("r1", "user-value", v2).id == r2.id)
  }

  test("scheme registry and repository resolve schema-registry URIs") {
    EmbeddedSchemaRegistry.reset()
    EmbeddedSchemaRegistry.register("reg-a", "device-profile", v1)
    val ser = ValueSerializer.of("schema-registry:reg-a/device-profile")
    assert(ser.isInstanceOf[SchemaRegistryValueSerializer])
    assert(ser.asInstanceOf[SchemaRegistryValueSerializer].fields ==
      Seq("id" -> "long", "name" -> "string"))
    val repo = Repository.parse(
      """entities { device { attributes {
        |  "profile" { scheme: "schema-registry:reg-a/device-profile" }
        |} } }""".stripMargin)
    assert(repo.entity("device").attribute("profile").get
      .serializer.isInstanceOf[SchemaRegistryValueSerializer])
  }
}
