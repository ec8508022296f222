package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IniConfig

/** Pins [[IniConfig]] to the configparser behaviors the reference's
  * `config.ini` round-trip depends on (`spark_streaming.py:16-24,38-42`).
  */
class IniConfigSpec extends AnyFunSuite {

  private val sample =
    """; postgres coordinates
      |[database]
      |database = trip_db
      |User = Analyst
      |password: S3cret=with=equals
      |host = db.internal
      |
      |# kafka coordinates
      |[Kafka]
      |host = broker-1
      |port = 9092
      |topic = taxi_trips
      |topic = taxi_trips_v2
      |""".stripMargin

  test("sections, both delimiters, comments, case folding, last-dup-wins") {
    val c = IniConfig.parse(sample.linesIterator)
    assert(c.get("database", "database").contains("trip_db"))
    // keys fold to lower case; values keep case
    assert(c.get("database", "USER").contains("Analyst"))
    // ':' delimiter; later '=' chars belong to the value
    assert(c.get("database", "password").contains("S3cret=with=equals"))
    // section names fold too
    assert(c.get("kafka", "host").contains("broker-1"))
    // duplicate key: last one wins (configparser strict=False behavior)
    assert(c.kafkaTopic.contains("taxi_trips_v2"))
    assert(c.get("nope", "x").isEmpty)
  }

  test("derived jdbc and kafka coordinates match the reference's assembly") {
    val c = IniConfig.parse(sample.linesIterator)
    val (url, props) = c.jdbc.get
    assert(url == "jdbc:postgresql://db.internal:5432/trip_db")
    assert(props.getProperty("user") == "Analyst")
    assert(props.getProperty("password") == "S3cret=with=equals")
    assert(c.kafkaBootstrap.contains("broker-1:9092"))
  }

  test("file load round-trips") {
    val p = java.nio.file.Files.createTempFile("graft_ini", ".ini")
    java.nio.file.Files.writeString(p, sample)
    try {
      val c = IniConfig.load(p.toString)
      assert(c.get("database", "host").contains("db.internal"))
    } finally java.nio.file.Files.delete(p)
  }

  test("malformed input fails loudly, not silently") {
    intercept[IllegalArgumentException](IniConfig.parse(Seq("key_before_section = 1")))
    intercept[IllegalArgumentException](IniConfig.parse(Seq("[s]", "no_delimiter_here")))
  }
}
