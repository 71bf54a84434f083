"""AWS CloudWatch Logs EXPORT translator: OTLP logs -> CloudWatch
InputLogEvent rows (``exporter/awscloudwatchlogsexporter/{exporter,
util}.go``).

- log group / stream      — util.go:28-110: the configured templates
  replace every ``{PatternKey}`` with the resource attr named by the
  key itself, else its mapped attribute (ClusterName ->
  aws.ecs.cluster.name, TaskId, NodeName, PodName -> pod,
  ServiceName -> service.name, ContainerInstanceId,
  TaskDefinitionFamily, InstanceId -> service.instance.id, FaasName,
  FaasVersion); a missing or empty value becomes "undefined"
- raw mode                — exporter.go:181-202: the message is the
  body verbatim; EMF metadata embedded in the body overrides the
  stream key (v1 ``_aws.logGroupName``/``_aws.logStreamName``, else
  v0 ``log_group_name``/``log_stream_name``; stream only overridden
  when non-empty)
- structured mode         — exporter.go:157-177,203-227: the message
  is the cwLogBody JSON in Go struct-field order (body,
  severity_number, severity_text, dropped_attributes_count, flags,
  trace_id, span_id, attributes, scope, resource — every field
  omitempty; the scope object only when the scope has a name; map
  values render with byte-sorted keys like Go json.Marshal)
- timestamp               — exporter.go:237: log timestamp in ms

Zero-shuffle codegen projection; attribute values are their string
forms (the map<string,string> model), so typed AsRaw rendering is
the producer's concern.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PATTERN_KEY_TO_ATTR = {
    "ClusterName": "aws.ecs.cluster.name",
    "TaskId": "aws.ecs.task.id",
    "NodeName": "k8s.node.name",
    "PodName": "pod",
    "ServiceName": "service.name",
    "ContainerInstanceId": "aws.ecs.container.instance.id",
    "TaskDefinitionFamily": "aws.ecs.task.family",
    "InstanceId": "service.instance.id",
    "FaasName": "faas.name",
    "FaasVersion": "faas.version",
}


def _jstr(c: Column) -> Column:
    js = F.to_json(F.array(F.coalesce(c, F.lit(""))))
    return F.substring(js, F.lit(2), F.length(js) - 2)


def _sorted_map_json(m: Column) -> Column:
    ents = F.array_sort(F.coalesce(
        F.map_entries(m),
        F.expr("array()").cast(
            "array<struct<key:string,value:string>>")))
    return F.concat(
        F.lit("{"),
        F.array_join(F.transform(
            ents, lambda e: F.concat(_jstr(e["key"]), F.lit(":"),
                                     _jstr(e["value"]))), ","),
        F.lit("}"))


def _replace_patterns(template: str, res: Column) -> Column:
    s: Column = F.lit(template)
    for key, attr in PATTERN_KEY_TO_ATTR.items():
        if "{" + key + "}" not in template:
            continue
        value = F.coalesce(
            F.nullif(F.element_at(res, F.lit(key)), F.lit("")),
            F.nullif(F.element_at(res, F.lit(attr)), F.lit("")),
            F.lit("undefined"))
        s = F.replace(s, F.lit("{" + key + "}"), value)
    return s


def cloudwatch_log_events(
    df: DataFrame,
    *,
    id_cols: list[str],
    log_group_template: str = "",
    log_stream_template: str = "",
    raw_log: bool = False,
) -> DataFrame:
    res = F.col("res_attrs")
    body = F.coalesce(F.col("body"), F.lit(""))
    group = _replace_patterns(log_group_template, res)
    stream = _replace_patterns(log_stream_template, res)

    if raw_log:
        v1_group = F.nullif(
            F.get_json_object(body, "$._aws.logGroupName"), F.lit(""))
        v1_stream = F.nullif(
            F.get_json_object(body, "$._aws.logStreamName"), F.lit(""))
        v0_group = F.nullif(
            F.get_json_object(body, "$.log_group_name"), F.lit(""))
        v0_stream = F.nullif(
            F.get_json_object(body, "$.log_stream_name"), F.lit(""))
        group = F.when(v1_group.isNotNull(), v1_group) \
            .when(v0_group.isNotNull(), v0_group).otherwise(group)
        stream = F.when(v1_group.isNotNull(),
                        F.coalesce(v1_stream, stream)) \
            .when(v0_group.isNotNull(), F.coalesce(v0_stream, stream)) \
            .otherwise(stream)
        message = body
    else:
        sev_num = F.coalesce(F.col("severity_number"), F.lit(0)) \
            .cast("int")
        sev_text = F.coalesce(F.col("severity_text"), F.lit(""))
        dropped = F.coalesce(F.col("dropped"), F.lit(0)).cast("int")
        flags = F.coalesce(F.col("flags"), F.lit(0)).cast("int")
        trace_id = F.coalesce(F.col("trace_id"), F.lit(""))
        span_id = F.coalesce(F.col("span_id"), F.lit(""))
        attrs = F.col("attrs")
        scope_name = F.coalesce(F.col("scope_name"), F.lit(""))
        scope_ver = F.coalesce(F.col("scope_version"), F.lit(""))
        scope_attrs = F.col("scope_attrs")
        scope_json = F.concat(
            F.lit('{"name":'), _jstr(scope_name),
            F.coalesce(F.when(scope_ver != "",
                              F.concat(F.lit(',"version":'),
                                       _jstr(scope_ver))), F.lit("")),
            F.coalesce(
                F.when(F.size(F.coalesce(
                    F.map_keys(scope_attrs),
                    F.expr("array()").cast("array<string>"))) > 0,
                    F.concat(F.lit(',"attributes":'),
                             _sorted_map_json(scope_attrs))),
                F.lit("")),
            F.lit("}"))
        frags = F.filter(F.array(
            F.when(body != "", F.concat(F.lit('"body":'), _jstr(body))),
            F.when(sev_num != 0,
                   F.concat(F.lit('"severity_number":'),
                            sev_num.cast("string"))),
            F.when(sev_text != "",
                   F.concat(F.lit('"severity_text":'),
                            _jstr(sev_text))),
            F.when(dropped != 0,
                   F.concat(F.lit('"dropped_attributes_count":'),
                            dropped.cast("string"))),
            F.when(flags != 0, F.concat(F.lit('"flags":'),
                                        flags.cast("string"))),
            F.when(trace_id != "", F.concat(F.lit('"trace_id":'),
                                            _jstr(trace_id))),
            F.when(span_id != "", F.concat(F.lit('"span_id":'),
                                           _jstr(span_id))),
            F.when(F.size(F.coalesce(
                F.map_keys(attrs),
                F.expr("array()").cast("array<string>"))) > 0,
                F.concat(F.lit('"attributes":'),
                         _sorted_map_json(attrs))),
            F.when(scope_name != "", F.concat(F.lit('"scope":'),
                                              scope_json)),
            F.when(F.size(F.coalesce(
                F.map_keys(res),
                F.expr("array()").cast("array<string>"))) > 0,
                F.concat(F.lit('"resource":'),
                         _sorted_map_json(res))),
        ), lambda x: x.isNotNull())
        message = F.concat(F.lit("{"), F.array_join(frags, ","),
                           F.lit("}"))

    return df.select(
        *id_cols,
        (F.coalesce(F.col("ts_ns"), F.lit(0)).cast("decimal(38,0)")
         / F.lit(1_000_000)).cast("bigint").alias("timestamp_ms"),
        message.alias("message"),
        group.alias("log_group"),
        stream.alias("log_stream"),
    )
