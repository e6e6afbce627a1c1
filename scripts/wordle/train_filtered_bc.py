"""Train filtered_bc on wordle — wrapper over the unified CLI."""
import sys

from lmrl_gym_tpu.cli.train import main

if __name__ == "__main__":
    main(["--task", "wordle", "--algo", "filtered_bc"] + sys.argv[1:])
