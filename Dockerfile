# Image for the docker-compose services (reference Dockerfile parity,
# adapted: the engine needs a JVM for Spark local mode).
FROM python:3.11-slim

WORKDIR /app

RUN apt-get update \
    && apt-get install -y --no-install-recommends openjdk-17-jre-headless \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

RUN pip install --no-cache-dir pyspark==4.1.2 pyarrow pandas numpy duckdb \
    pytest hypothesis requests

COPY financial_data_engineering_spark/ financial_data_engineering_spark/
COPY examples/ examples/
COPY tests/ tests/
COPY tools/ tools/
COPY bench.py __spark_entry__.py Makefile ./

ENV PYTHONUNBUFFERED=1

CMD ["python", "examples/multi_source_pipeline.py"]
