#!/usr/bin/env python3
"""Structural load test for dags/graft_aw_dag.py.

Airflow is not installed in this container, so the test injects a
minimal stub of the two Airflow symbols the DAG imports (DAG,
BashOperator) that records task registration and dependency wiring,
then EXECUTES the DAG file — a stronger check than text/AST matching:
the file must import, run top-to-bottom, and produce the reference
topology (5 parallel dims -> fato; reference README.md:113).

Exit 0 iff the DAG loads and the topology matches.
"""

import sys
import types
from pathlib import Path


def install_airflow_stub():
    class DAG:
        _current = None

        def __init__(self, dag_id, **kwargs):
            self.dag_id = dag_id
            self.kwargs = kwargs
            self.tasks = []

        def __enter__(self):
            DAG._current = self
            return self

        def __exit__(self, *exc):
            DAG._current = None
            return False

    class BashOperator:
        def __init__(self, task_id, bash_command, **kwargs):
            self.task_id = task_id
            self.bash_command = bash_command
            self.upstream = set()
            self.downstream = set()
            if DAG._current is not None:
                DAG._current.tasks.append(self)

        def set_downstream(self, other):
            self.downstream.add(other.task_id)
            other.upstream.add(self.task_id)

        def __rshift__(self, other):  # task >> task
            self.set_downstream(other)
            return other

        def __rrshift__(self, others):  # [task, ...] >> task
            for t in others:
                t.set_downstream(self)
            return self

    airflow = types.ModuleType("airflow")
    airflow.DAG = DAG
    operators = types.ModuleType("airflow.operators")
    bash = types.ModuleType("airflow.operators.bash")
    bash.BashOperator = BashOperator
    airflow.operators = operators
    operators.bash = bash
    sys.modules["airflow"] = airflow
    sys.modules["airflow.operators"] = operators
    sys.modules["airflow.operators.bash"] = bash
    return DAG


def load_dag(dag_cls, name: str):
    path = Path(__file__).resolve().parent.parent / "dags" / f"{name}.py"
    namespace = {"__name__": name, "__file__": str(path)}
    exec(compile(path.read_text(), str(path), "exec"), namespace)
    dag = namespace.get("dag")
    assert isinstance(dag, dag_cls), f"{name} must bind a `dag` object"
    return dag


def check_curate(dag_cls) -> None:
    dag = load_dag(dag_cls, "graft_curate_dag")
    assert dag.dag_id == "graft_curate", dag.dag_id
    tasks = {t.task_id: t for t in dag.tasks}
    chain = ["curate_signals", "curate_dedup", "curate_final",
             "curate_report"]
    assert set(tasks) == set(chain), set(tasks)
    for prev, nxt in zip(chain, chain[1:]):
        assert tasks[nxt].upstream == {prev}, \
            f"{nxt} must depend on {prev} only, got {tasks[nxt].upstream}"
    assert tasks[chain[0]].upstream == set()
    for task_id, stage in zip(chain, ["signals", "dedup", "final", "report"]):
        cmd = tasks[task_id].bash_command
        assert "graft.CurateRun" in cmd, cmd
        assert f"--stage {stage}" in cmd, cmd
    print("dag ok: curate signals -> dedup -> final -> report, "
          "four spark-submit tasks")


def main() -> int:
    dag_cls = install_airflow_stub()
    path = Path(__file__).resolve().parent.parent / "dags" / "graft_aw_dag.py"
    namespace = {"__name__": "graft_aw_dag", "__file__": str(path)}
    exec(compile(path.read_text(), str(path), "exec"), namespace)

    dag = namespace.get("dag")
    assert isinstance(dag, dag_cls), "DAG file must bind a `dag` object"
    assert dag.dag_id == "graft_aw_dw", dag.dag_id
    assert dag.kwargs.get("schedule") is None
    assert dag.kwargs.get("catchup") is False

    tasks = {t.task_id: t for t in dag.tasks}
    dims = ["etl_dim_produto", "etl_dim_cliente", "etl_dim_localidade",
            "etl_dim_vendedor", "etl_dim_tempo"]
    expected = set(dims) | {"etl_fato_vendas"}
    assert set(tasks) == expected, f"tasks {set(tasks)} != {expected}"

    fato = tasks["etl_fato_vendas"]
    assert fato.upstream == set(dims), \
        f"fato must depend on all five dims, got {fato.upstream}"
    for d in dims:
        assert tasks[d].upstream == set(), f"{d} must have no upstream"
        assert tasks[d].downstream == {"etl_fato_vendas"}

    for t in tasks.values():
        table = t.task_id.removeprefix("etl_")
        assert "graft.etl.aw.AwRun" in t.bash_command, t.bash_command
        assert f"--table {table}" in t.bash_command, t.bash_command

    print("dag ok: 5 parallel dims -> fato, six spark-submit tasks")
    check_curate(dag_cls)
    return 0


if __name__ == "__main__":
    sys.exit(main())
