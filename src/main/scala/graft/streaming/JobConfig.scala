package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Runtime configuration in the reference's property-group shape
  * (reference `flink/application_properties.json.replace:2-27`): a JSON
  * array of `{PropertyGroupId, PropertyMap}` objects, looked up by group
  * id then key (reference `tumbling_window.py:80-93`).
  */
final case class JobConfig(groups: Map[String, Map[String, String]]) {

  /** `property_map(props, groupId)` (reference `tumbling_window.py:90-93`). */
  def group(id: String): Map[String, String] = groups.getOrElse(id, Map.empty)

  def get(groupId: String, key: String): Option[String] = group(groupId).get(key)

  // Consumer/producer keys the reference reads (tumbling_window.py:216-226,
  // sliding_window.py:196-209).
  def inputStreamName: Option[String] = get(JobConfig.ConsumerGroup, "input.stream.name")
  def outputStreamName: Option[String] = get(JobConfig.ProducerGroup, "output.stream.name")
  def initpos: String = get(JobConfig.ConsumerGroup, "flink.stream.initpos").getOrElse("LATEST")
  def timestampStandard: String =
    get(JobConfig.ConsumerGroup, "json.timestamp_format_standard").getOrElse("SQL")
  def windowOver: String =
    JobConfig.duration(get(JobConfig.ConsumerGroup, "flink.sliding_window.over").getOrElse("8.hours"))
  def windowEvery: String =
    JobConfig.duration(get(JobConfig.ConsumerGroup, "flink.sliding_window.every").getOrElse("1.minutes"))
  def windowOn: String = get(JobConfig.ConsumerGroup, "flink.sliding_window.on").getOrElse("utc")
}

object JobConfig {
  val ConsumerGroup = "consumer.config.0"
  val ProducerGroup = "producer.config.0"

  /** Parse the reference's `"8.hours"` / `"1.minutes"` Table-API duration
    * spelling into a Spark interval string (`"8 hours"`).
    */
  def duration(s: String): String = s.replace(".", " ")

  def parse(json: String): JobConfig = {
    val root = new ObjectMapper().readTree(json)
    val groups = root.elements().asScala.map { g =>
      val id = g.get("PropertyGroupId").asText()
      val m = g.get("PropertyMap")
      id -> m.fieldNames().asScala.map(k => k -> m.get(k).asText()).toMap
    }.toMap
    JobConfig(groups)
  }

  def load(path: String): JobConfig =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
