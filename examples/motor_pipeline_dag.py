"""Airflow orchestration example (reference parity: the reference ships a
daily DockerOperator DAG, ``/root/reference/dags/motor_pipeline_dag.py``).

Ours invokes the package CLI directly — the engine is a plain Python
package, so any orchestrator (Airflow BashOperator/KubernetesPodOperator,
cron, dagster) can run it; no Docker daemon required.  Guarded import so
the repo's test environment (no airflow) can still lint/import the file.
"""

from __future__ import annotations

from datetime import datetime, timedelta

try:
    from airflow import DAG
    from airflow.operators.bash import BashOperator
except ImportError:  # pragma: no cover - airflow not installed here
    DAG = None

DEFAULT_ARGS = {
    "owner": "data-engineering",
    "retries": 1,
    "retry_delay": timedelta(minutes=5),
}

if DAG is not None:  # pragma: no cover
    with DAG(
        dag_id="motor_ingestion_pipeline",
        default_args=DEFAULT_ARGS,
        schedule="@daily",
        start_date=datetime(2026, 1, 1),
        catchup=False,
        tags=["ingestion", "validation"],
    ) as dag:
        run_motor_pipeline = BashOperator(
            task_id="run_motor_pipeline",
            bash_command=(
                "python -m ominimo_dynamic_data_pipeline_spark "
                "--metadata {{ var.value.motor_metadata_path }} "
                "--dataflow-name motor-ingestion "
                "--input-path {{ var.value.motor_input_glob }}"
            ),
        )
