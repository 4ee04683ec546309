package graft.etl.aw

import org.apache.spark.sql.types._

/** Explicit input schemas for the AdventureWorks 2019 CSV extract
  * (FIXTURES.md; headers verified against /root/reference/dags/data/).
  * Explicit schemas — never inference — because CSV dtype inference is
  * nondeterministic at scale (SURVEY.md §2.1 S1).
  */
object AwSchemas {
  private def st(pairs: (String, DataType)*): StructType =
    StructType(pairs.map { case (n, t) => StructField(n, t, nullable = true) })

  val product: StructType = st(
    "ProductID" -> IntegerType, "Name" -> StringType,
    "ProductNumber" -> StringType, "MakeFlag" -> StringType,
    "FinishedGoodsFlag" -> StringType, "Color" -> StringType,
    "SafetyStockLevel" -> IntegerType, "ReorderPoint" -> IntegerType,
    "StandardCost" -> DoubleType, "ListPrice" -> DoubleType,
    "Size" -> StringType, "SizeUnitMeasureCode" -> StringType,
    "WeightUnitMeasureCode" -> StringType, "Weight" -> DoubleType,
    "DaysToManufacture" -> IntegerType, "ProductLine" -> StringType,
    "Class" -> StringType, "Style" -> StringType,
    "ProductSubcategoryID" -> IntegerType, "ProductModelID" -> IntegerType,
    "SellStartDate" -> StringType, "SellEndDate" -> StringType,
    "DiscontinuedDate" -> StringType, "rowguid" -> StringType,
    "ModifiedDate" -> StringType)

  val productSubcategory: StructType = st(
    "ProductSubcategoryID" -> IntegerType, "ProductCategoryID" -> IntegerType,
    "Name" -> StringType, "rowguid" -> StringType, "ModifiedDate" -> StringType)

  val productCategory: StructType = st(
    "ProductCategoryID" -> IntegerType, "Name" -> StringType,
    "rowguid" -> StringType, "ModifiedDate" -> StringType)

  val customer: StructType = st(
    "CustomerID" -> IntegerType, "PersonID" -> IntegerType,
    "StoreID" -> IntegerType, "TerritoryID" -> IntegerType,
    "AccountNumber" -> StringType, "rowguid" -> StringType,
    "ModifiedDate" -> StringType)

  val person: StructType = st(
    "BusinessEntityID" -> IntegerType, "PersonType" -> StringType,
    "NameStyle" -> StringType, "Title" -> StringType,
    "FirstName" -> StringType, "MiddleName" -> StringType,
    "LastName" -> StringType, "Suffix" -> StringType,
    "EmailPromotion" -> IntegerType, "AdditionalContactInfo" -> StringType,
    "Demographics" -> StringType, "rowguid" -> StringType,
    "ModifiedDate" -> StringType)

  val address: StructType = st(
    "AddressID" -> IntegerType, "AddressLine1" -> StringType,
    "AddressLine2" -> StringType, "City" -> StringType,
    "StateProvinceID" -> IntegerType, "PostalCode" -> StringType,
    "SpatialLocation" -> StringType, "rowguid" -> StringType,
    "ModifiedDate" -> StringType)

  val stateProvince: StructType = st(
    "StateProvinceID" -> IntegerType, "StateProvinceCode" -> StringType,
    "CountryRegionCode" -> StringType, "IsOnlyStateProvinceFlag" -> StringType,
    "Name" -> StringType, "TerritoryID" -> IntegerType,
    "rowguid" -> StringType, "ModifiedDate" -> StringType)

  val countryRegion: StructType = st(
    "CountryRegionCode" -> StringType, "Name" -> StringType,
    "ModifiedDate" -> StringType)

  val salesPerson: StructType = st(
    "BusinessEntityID" -> IntegerType, "TerritoryID" -> IntegerType,
    "SalesQuota" -> DoubleType, "Bonus" -> DoubleType,
    "CommissionPct" -> DoubleType, "SalesYTD" -> DoubleType,
    "SalesLastYear" -> DoubleType, "rowguid" -> StringType,
    "ModifiedDate" -> StringType)

  val employee: StructType = st(
    "BusinessEntityID" -> IntegerType, "NationalIDNumber" -> StringType,
    "LoginID" -> StringType, "OrganizationNode" -> StringType,
    "OrganizationLevel" -> IntegerType, "JobTitle" -> StringType,
    "BirthDate" -> StringType, "MaritalStatus" -> StringType,
    "Gender" -> StringType, "HireDate" -> StringType,
    "SalariedFlag" -> StringType, "VacationHours" -> IntegerType,
    "SickLeaveHours" -> IntegerType, "CurrentFlag" -> StringType,
    "rowguid" -> StringType, "ModifiedDate" -> StringType)

  val salesOrderHeader: StructType = st(
    "SalesOrderID" -> IntegerType, "RevisionNumber" -> IntegerType,
    "OrderDate" -> StringType, "DueDate" -> StringType,
    "ShipDate" -> StringType, "Status" -> IntegerType,
    "OnlineOrderFlag" -> StringType, "SalesOrderNumber" -> StringType,
    "PurchaseOrderNumber" -> StringType, "AccountNumber" -> StringType,
    "CustomerID" -> IntegerType, "SalesPersonID" -> IntegerType,
    "TerritoryID" -> IntegerType, "BillToAddressID" -> IntegerType,
    "ShipToAddressID" -> IntegerType, "ShipMethodID" -> IntegerType,
    "CreditCardID" -> IntegerType, "CreditCardApprovalCode" -> StringType,
    "CurrencyRateID" -> IntegerType, "SubTotal" -> DoubleType,
    "TaxAmt" -> DoubleType, "Freight" -> DoubleType,
    "TotalDue" -> DoubleType, "Comment" -> StringType,
    "rowguid" -> StringType, "ModifiedDate" -> StringType)

  val salesOrderDetail: StructType = st(
    "SalesOrderID" -> IntegerType, "SalesOrderDetailID" -> IntegerType,
    "CarrierTrackingNumber" -> StringType, "OrderQty" -> IntegerType,
    "ProductID" -> IntegerType, "SpecialOfferID" -> IntegerType,
    "UnitPrice" -> DoubleType, "UnitPriceDiscount" -> DoubleType,
    "LineTotal" -> DoubleType, "rowguid" -> StringType,
    "ModifiedDate" -> StringType)
}
