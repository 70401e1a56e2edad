package graft.core

import org.apache.spark.sql.types._

/** Declared entity schemas (SURVEY.md §1.2) — the engine's boundary
  * contract: schemas are fixed at the edges like the reference's DDL,
  * never inferred mid-flight.
  */
object Schemas {

  /** The canonical 7-column orders entity
    * (mssql_init/mssql_init.sql:24-32). DECIMAL(18,4) is kept end-to-end
    * rather than the reference's float64 hop (SURVEY.md §7.4 risk 3). */
  val orders: StructType = StructType(Seq(
    StructField("OrderID", LongType, nullable = false),
    StructField("UserID", LongType),
    StructField("AddedToCartAt", TimestampType),
    StructField("OrderCreatedAt", TimestampType),
    StructField("Amount", DecimalType(18, 4)),
    StructField("Product", StringType),
    StructField("IsDelivered", BooleanType)))

  /** Raw CSV shape of the same entity: every column as string, parsed by
    * the Conversions suite (the Spark equivalent of
    * csv_to_mssqldb.py:242-327's per-column coercion, instead of letting
    * the CSV reader guess). */
  val ordersCsvRaw: StructType = StructType(
    orders.fields.map(f => StructField(f.name, StringType)))

  /** Upsert key for orders (dags/mssql_to_postgresql_orders_daily.py:106
    * — `order_id` post-lowercasing; `OrderID` at the MSSQL edge). */
  val ordersKey: Seq[String] = Seq("OrderID")

  /** The wide ~57-column transactions entity, recovered from
    * dags/__pycache__/deneme_3_case.cpython-38.pyc strings (SURVEY.md
    * §1.2): identity/key, id, amount, timestamp, boolean-flag, code and
    * JSON-in-string column families. Numeric width choices follow the
    * pyc's Int64/Int32 conversion lists; correlation ids are strings.
    */
  val transactions: StructType = {
    val keyCols = Seq(
      StructField("TxCorrelationId", StringType, nullable = false),
      StructField("TenantId", LongType, nullable = false),
      StructField("TxGroupCorrelationId", StringType),
      StructField("TxRefCorrelationId", StringType))
    val idCols = Seq(
      "WalletId", "ToWalletId", "FromAccountId", "ToAccountId")
      .map(StructField(_, LongType)) ++ Seq(
      "FromAccountTypeId", "ToAccountTypeId", "ProviderId",
      "SettlementTypeId").map(StructField(_, IntegerType))
    val amountCols = Seq(
      "TxBaseAmount", "TxAdditionalFee", "TxAmountWithAdditionalFee",
      "ToAccountTxBaseAmount", "ToAccountTxAdditionalFee",
      "ToAccountTxAmountWithAdditionalFee")
      .map(StructField(_, DecimalType(18, 4)))
    val tsCols = Seq(
      "CreatedDateUtc", "UpdatedDateUtc", "CompletedDateUtc",
      "FinancialProcessCompletedDateUtc", "SummaryCreatedDateUtc")
      .map(StructField(_, TimestampType))
    val boolCols = Seq(
      "IsFinancialProcessCompleted", "IsNeedSettlement",
      "IsAdjustLimitSuccessProcessed", "IsAdjustLimitCancelProcessed",
      "IsHidden", "IsHiddenForReceiver", "IsHiddenForSender")
      .map(StructField(_, BooleanType))
    val strCols = Seq(
      "TransactionTypeCode", "TransactionStatusCode", "ResultCode",
      "CurrencyCode", "SettlementDay", "KYCLevelCode", "ChannelType",
      "SourceType", "MediaType", "MediaIdentifier", "TerminalNo",
      "TenantName", "TenantCode", "FromDescription", "ToDescription",
      "FromWalletNumber", "ToWalletNumber", "FromAccountNumber",
      "ToAccountNumber", "FromExtAccountNumber", "ToExtAccountNumber",
      "FromGroupCode", "ToGroupCode", "ExtTransactionId",
      "ReceiptNumber", "TxAdditionalDataJson", "TxEndUserPreviewJson")
      .map(StructField(_, StringType))
    StructType(keyCols ++ idCols ++ amountCols ++ tsCols ++ boolCols ++ strCols)
  }

  /** Composite transactions upsert key
    * (dags/__pycache__/mssql_to_postgresql_daily.cpython-38.pyc strings:
    * `txcorrelationid,tenantid,txgroupcorrelationid,txrefcorrelationid`). */
  val transactionsKey: Seq[String] = Seq(
    "TxCorrelationId", "TenantId", "TxGroupCorrelationId",
    "TxRefCorrelationId")
}
