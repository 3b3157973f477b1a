"""Agent layer: LRPG, DQN, DDPG, NAF, random — rebuilds of the reference's
L3 CLIs (SURVEY.md §1, §2.1).  Each module is runnable:
``python -m cartpoleplusplus_tpu.agents.<name> --flags``.
"""
