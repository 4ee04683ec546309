"""Graft DW build orchestrated by Airflow.

Spark-native counterpart of the reference's six per-table DAGs
(reference dags/etl_dim_produto.py .. etl_fato_vendas.py), collapsed
into one DAG with the documented ordering contract "Dimensões -> Fato"
(reference README.md:113) made explicit as task dependencies: the five
dimension builds are independent and run in parallel; the fact build
reads the dimension surrogate-key maps back from the sink — the same
task-boundary read-back the reference's fact DAG does from Postgres
(reference dags/etl_fato_vendas.py:21-24) — and therefore depends on
all five.

Each task is one spark-submit of ``graft.etl.aw.AwRun --table <name>``,
which builds and sinks exactly one DW table. Requires Airflow >= 2.4
(the ``schedule=`` kwarg — the same API level the reference DAGs use).
Deployment knobs come from the environment so the file needs no edits
per image:

  GRAFT_SPARK_SUBMIT  spark-submit binary (default: spark-submit on PATH)
  GRAFT_JAR           the assembled graft jar
  GRAFT_CSV_DIR       AdventureWorks CSV input directory
  GRAFT_OUT_DIR       DW sink directory (parquet; one subdir per table)
  GRAFT_SPARK_ARGS    extra spark-submit args (e.g. --master yarn)
"""

import os
import shlex
from datetime import datetime

from airflow import DAG
from airflow.operators.bash import BashOperator

SPARK_SUBMIT = os.environ.get("GRAFT_SPARK_SUBMIT", "spark-submit")
SPARK_ARGS = os.environ.get("GRAFT_SPARK_ARGS", "")
GRAFT_JAR = os.environ.get("GRAFT_JAR", "/opt/graft/graft-assembly.jar")
CSV_DIR = os.environ.get("GRAFT_CSV_DIR", "/opt/airflow/dags/data")
OUT_DIR = os.environ.get("GRAFT_OUT_DIR", "/opt/graft/dw")

DIMS = ["dim_produto", "dim_cliente", "dim_localidade", "dim_vendedor",
        "dim_tempo"]


def spark_submit_cmd(table: str) -> str:
    # paths are deployment-provided: quote them so spaces/metacharacters
    # in an image's filesystem layout can't split the argv
    return (f"{SPARK_SUBMIT} {SPARK_ARGS} --class graft.etl.aw.AwRun "
            f"{shlex.quote(GRAFT_JAR)} --table {table} "
            f"{shlex.quote(CSV_DIR)} {shlex.quote(OUT_DIR)}")


default_args = {
    "owner": "airflow",
    "start_date": datetime(2023, 1, 1),
    "retries": 1,
}

with DAG(
    "graft_aw_dw",
    default_args=default_args,
    schedule=None,  # run manually, like the reference DAGs
    catchup=False,
    tags=["dw", "adventureworks", "spark"],
) as dag:
    dim_tasks = [
        BashOperator(task_id=f"etl_{t}", bash_command=spark_submit_cmd(t))
        for t in DIMS
    ]
    fato = BashOperator(
        task_id="etl_fato_vendas",
        bash_command=spark_submit_cmd("fato_vendas"),
    )
    dim_tasks >> fato
