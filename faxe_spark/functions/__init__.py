from faxe_spark.functions.lambda_lib import LAMBDA_FUNCTIONS, truthy, undefined

__all__ = ["LAMBDA_FUNCTIONS", "truthy", "undefined"]
