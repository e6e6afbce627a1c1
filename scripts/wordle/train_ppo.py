"""Train ppo on wordle — wrapper over the unified CLI."""
import sys

from lmrl_gym_tpu.cli.train import main

if __name__ == "__main__":
    main(["--task", "wordle", "--algo", "ppo"] + sys.argv[1:])
