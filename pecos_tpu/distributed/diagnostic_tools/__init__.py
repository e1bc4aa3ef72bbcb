from .comm_check import run_comm_self_test  # noqa: F401
