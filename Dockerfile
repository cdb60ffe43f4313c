# graft — Spark-native etl-prometheus2clickhouse (reference
# Dockerfile re-expressed for a JVM/Spark deployment: the reference
# ships a uv-built Python venv with `python3 main.py` as entrypoint;
# the Spark equivalent is a thin application jar submitted to
# spark-submit inside the official Spark runtime image, which already
# carries every runtime dependency this library has).
#
# Build-sandbox note: this environment has zero egress, so the image
# pulls below are a documented dry-run here; OpsPackagingSpec asserts
# the wiring (entrypoint class, jar path, env pass-through) instead.

# --- build stage: compile the thin jar with sbt -------------------------
FROM sbtscala/scala-sbt:eclipse-temurin-jammy-17.0.10_7_1.10.11_2.13.17 AS builder

WORKDIR /build
COPY build.sbt ./
COPY project/ project/
COPY src/main/ src/main/
# the repo resolves Spark from unmanagedBase=/opt/spark/jars; inside the
# builder we point it at the Spark image's jars mounted from the runtime
# stage context — for a plain `docker build`, install Spark jars first:
COPY --from=apache/spark:4.1.2-scala2.13-java17-ubuntu /opt/spark/jars /opt/spark/jars
RUN sbt -batch package

# --- runtime stage ------------------------------------------------------
FROM apache/spark:4.1.2-scala2.13-java17-ubuntu AS production

ENV TZ=Etc/UTC
WORKDIR /app
COPY --from=builder \
  /build/target/scala-2.13/etlprometheus2clickhousespark_2.13-0.1.0.jar \
  /app/graft.jar

# one pipeline iteration per container run, like the reference's
# `python3 main.py` (main.py:41-86); config via PROMETHEUS_* /
# CLICKHOUSE_* / BATCH_* env vars (env.example), dirs via volumes
ENTRYPOINT ["/opt/spark/bin/spark-submit", \
  "--master", "local[*]", \
  "--conf", "spark.sql.session.timeZone=UTC", \
  "--class", "graft.EtlMain", \
  "/app/graft.jar", \
  "/data/in", "/data/out", "/data/ledger"]
