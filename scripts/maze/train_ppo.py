"""Train ppo on maze — wrapper over the unified CLI."""
import sys

from lmrl_gym_tpu.cli.train import main

if __name__ == "__main__":
    main(["--task", "maze", "--algo", "ppo"] + sys.argv[1:])
