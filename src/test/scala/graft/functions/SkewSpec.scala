package graft.functions

import graft.SparkSpec
import graft.sources.Tables

class SkewSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin matches the plain join") {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, "l_orderkey")
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(li, o, "l_orderkey", salt = 8)
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("twoPhaseCountDistinct is exact") {
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val twoPhase = Skew.twoPhaseCountDistinct(ev, "event_type", "user_id", 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoPhase == plain)
  }

  test("avro value scheme round-trips generic records") {
    val schema =
      """{"type":"record","name":"User","fields":[
        |{"name":"name","type":"string"},{"name":"age","type":"int"}]}"""
        .stripMargin
    val ser = graft.core.ValueSerializer.of(s"avro:$schema")
      .asInstanceOf[graft.core.AvroValueSerializer]
    val rec = ser.defaultValue
    rec.put("name", "ada")
    rec.put("age", 36)
    val back = ser.deserialize(ser.serialize(rec)).get
    assert(back.get("name").toString == "ada" && back.get("age") == 36)
    assert(ser.fields == Seq("name" -> "string", "age" -> "int"))
  }
}
