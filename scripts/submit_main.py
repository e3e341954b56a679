"""spark-submit primary script: the package arrives via --py-files."""
from ttmf_spark.__main__ import main

if __name__ == "__main__":
    main()
