import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from _base import test_config

config = test_config(split=1, shots=1)
