import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from _base import train_config

config = train_config(split=2, shots=1)
