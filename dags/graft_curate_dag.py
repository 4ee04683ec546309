"""Corpus curation orchestrated by Airflow — the LLM-pipeline twin of
graft_aw_dag.py.

Three staged spark-submits of ``graft.CurateRun --stage <name>``, each
reading the previous stage's keep-list from the shared output directory
(the same task-boundary read-back contract the DW DAG uses for
surrogate-key maps):

  signals  rule gates (quality, Gopher battery, repetition, language-ID
           agreement, vocab coverage, fluency prior, trained-LM
           perplexity) -> keep_signals.parquet
  dedup    exact keep-one + near-dup canonical + contamination drop over
           the signal survivors -> keep_dedup.parquet
  final    passage cleaning over the dedup survivors; writes the cleaned
           language-partitioned corpus

Deployment knobs mirror the DW DAG:

  GRAFT_SPARK_SUBMIT  spark-submit binary (default: spark-submit on PATH)
  GRAFT_JAR           the assembled graft jar
  GRAFT_CORPUS_DIR    documents.parquet input directory
  GRAFT_CURATE_OUT    curation output directory (keep-lists + corpus)
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
CORPUS_DIR = os.environ.get("GRAFT_CORPUS_DIR", "/opt/graft/corpus_in")
OUT_DIR = os.environ.get("GRAFT_CURATE_OUT", "/opt/graft/corpus_out")

STAGES = ["signals", "dedup", "final"]


def spark_submit_cmd(stage: str) -> str:
    return (f"{SPARK_SUBMIT} {SPARK_ARGS} --class graft.CurateRun "
            f"{shlex.quote(GRAFT_JAR)} --stage {stage} "
            f"{shlex.quote(CORPUS_DIR)} {shlex.quote(OUT_DIR)}")


default_args = {
    "owner": "airflow",
    "start_date": datetime(2023, 1, 1),
    "retries": 1,
}

with DAG(
    "graft_curate",
    default_args=default_args,
    schedule=None,
    catchup=False,
    tags=["curation", "llm", "spark"],
) as dag:
    signals = BashOperator(
        task_id="curate_signals", bash_command=spark_submit_cmd("signals"))
    dedup = BashOperator(
        task_id="curate_dedup", bash_command=spark_submit_cmd("dedup"))
    final = BashOperator(
        task_id="curate_final", bash_command=spark_submit_cmd("final"))
    report = BashOperator(
        task_id="curate_report", bash_command=spark_submit_cmd("report"))
    signals >> dedup >> final >> report
