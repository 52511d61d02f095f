# Container packaging for the graft pipeline CLI — parity with the
# reference's image (/root/reference/Dockerfile:1-12), whose default
# command is the dev full load of every catalog table.
#
# Build the jar on the host first (`sbt package` — it is a thin jar;
# every runtime dependency is Spark itself, provided by the base image),
# then `docker build -t graft .`.
#
# The apache/spark base image must match the Spark/Scala line the jar
# was compiled against (Spark 4.x / Scala 2.13 / Java 17).
FROM apache/spark:4.1.2

WORKDIR /app
COPY target/scala-2.13/etl_data_pipelinespark_2.13-*.jar /app/graft.jar
COPY tables_list /app/tables_list
COPY bin/graft-app /app/bin/graft-app

# Endpoints resolve from the environment at runtime (PipelineConfig):
#   GRAFT_SOURCE=format:location   e.g. jdbc:mysql://source:3306/retail_db
#   GRAFT_SINK=format:location     e.g. jdbc:postgresql://target:5432/dw
#   SOURCE_DB_USER / SOURCE_DB_PASS / TARGET_DB_USER / TARGET_DB_PASS
ENV GRAFT_JAR=/app/graft.jar \
    SPARK_HOME=/opt/spark

ENTRYPOINT ["/app/bin/graft-app"]
# Reference parity: full load, dev environment, whole catalog.
CMD ["dev", "all"]
