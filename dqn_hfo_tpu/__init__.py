"""dqn_hfo_tpu: TPU-native Half Field Offense RL framework.

A from-scratch JAX/XLA rebuild of the capabilities of mhauskn/dqn-hfo
(parameterized-action DDPG on the HFO soccer domain, ICLR'16): a vectorized
in-graph soccer simulator replaces rcssserver+HFO, and a pure-functional
DDPG actor-learner replaces the patched-Caffe training stack.
"""

__version__ = "0.1.0"
