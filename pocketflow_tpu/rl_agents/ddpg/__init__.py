from pocketflow_tpu.rl_agents.ddpg.agent import DdpgAgent  # noqa: F401
