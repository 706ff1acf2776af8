# Container entry point (reference parity: reference/Dockerfile runs the
# metadata pipeline under python:3.11-slim + default-jdk).  PySpark needs a
# JVM; everything else is pure Python.
FROM python:3.11-slim

RUN apt-get update && \
    apt-get install -y --no-install-recommends default-jdk && \
    apt-get clean && rm -rf /var/lib/apt/lists/*

ENV JAVA_HOME=/usr/lib/jvm/default-java
ENV PATH="${JAVA_HOME}/bin:${PATH}"

WORKDIR /app

COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY . .

ENV PYTHONPATH=/app
ENV PYTHONUNBUFFERED=1

# Run the metadata-declared example dataflow; override the command to point
# at real metadata/input mounts.
CMD ["python", "-m", "ominimo_dynamic_data_pipeline_spark", \
     "--metadata", "examples/motor_pipeline.json", \
     "--dataflow-name", "motor-ingestion", \
     "--input-path", "tests/data/motor_policies.json"]
