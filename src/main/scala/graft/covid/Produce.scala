package graft.covid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ingestion half (K3, covid_producer.py:9-39): CSV rows →
  * JSON records → Kafka topic. The reference loops a Python KafkaProducer at
  * 10 rec/s; Spark-first, the same thing is a single distributed write —
  * every partition produces to Kafka in parallel, so ingest throughput
  * scales with executors instead of one driver-side loop.
  *
  * The env has no broker, so the Kafka write itself is exercised only at
  * plan level ([[kafkaPayload]] is unit-tested as decode's exact inverse;
  * StreamSpec round-trips payload → [[Stream.decode]]).
  */
object Produce {

  /** Row → Kafka message value: JSON-serialize every column
    * (covid_producer.py:10-12 value_serializer + :33 send(topic, row)).
    * `to_json(struct(*))` is the codegen'd equivalent of Python's
    * json.dumps(row) — and [[Stream.decode]]'s from_json inverts it. */
  def kafkaPayload(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))

  /** Batch-produce a DataFrame to a Kafka topic (K3). Executes eagerly —
    * call with a broker reachable. */
  def writeKafka(df: DataFrame, bootstrapServers: String,
      topic: String): Unit =
    kafkaPayload(df).write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()

  /** The full reference producer as one batch job (covid_producer.py:main):
    * CSV file → JSON → topic. No 0.1 s sleep — rate limiting belongs on the
    * consumer (`maxOffsetsPerTrigger`, [[Stream.kafkaSource]]), not as a
    * driver-side throttle. */
  def produceCsv(spark: SparkSession, csvPath: String,
      bootstrapServers: String, topic: String): Unit =
    writeKafka(Stream.csvSource(spark, csvPath), bootstrapServers, topic)
}
